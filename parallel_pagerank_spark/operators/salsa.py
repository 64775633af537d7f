"""SALSA — the Stochastic Approach for Link-Structure Analysis.

Public lineage: Lempel & Moran, WWW'00. SALSA is the degree-normalized
cousin of HITS: authority scores are the stationary distribution of the
two-step random walk authority → (uniform in-link) → hub → (uniform
out-link) → authority, and dually for hubs. Its killer property for a
distributed engine is the CLOSED FORM the paper proves: within each
connected component C of the bipartite support graph the stationary
weight of authority a is d_in(a) / Σ_{j∈C} d_in(j), and a uniform start
weights each component by its share of authority nodes |A_C| / |A|:

    salsa_authority(a) = (|A_C| · d_in(a)) / (|A| · Σ_{j∈C} d_in(j))

so NO power iteration is needed — one connected-components run on the
bipartite graph plus two aggregations, instead of HITS' per-iteration
normalize-and-multiply. (The hub side is the same with out-degrees.)

Spark shape: edges are deduplicated (SALSA walks the unweighted support
graph), lifted to the bipartite node space (hub h → 2h, authority a →
2a+1 — parity separates the sides; requires ids < 2^62, the engine's
dense-id rule already guarantees magnitudes far below that), components
come from the existing large-star/small-star operator, and the score is
a single exact-integer product ratio (na·d_in)/(|A|·Σd_in) evaluated in
one IEEE division — bit-reproducible across engines.

Reference parity note: the reference ships no SALSA; this extends the
HITS/PageRank family it motivates (`/root/reference/README.md` background
section) with the third classic of the same literature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .components import large_star_small_star


def salsa_scores(edges: DataFrame, side: str = "authority") -> DataFrame:
    """→ (id, score): SALSA scores for ``side`` ∈ {authority, hub}.

    Scores sum to 1.0 over the side's nodes (up to float rounding).
    Duplicate edges collapse; a self-loop (x, x) is legitimate (hub-x
    and authority-x are distinct bipartite nodes).
    """
    if side not in ("authority", "hub"):
        raise ValueError(f"side must be authority|hub, got {side!r}")
    de = edges.select("src", "dst").distinct()
    bip = de.select(
        (F.col("src") * 2).alias("src"),
        (F.col("dst") * 2 + 1).alias("dst"),
    )
    comp = large_star_small_star(bip).components  # (id, component)
    if side == "authority":
        deg = de.groupBy(F.col("dst").alias("id")).agg(
            F.count("*").alias("deg")
        )
        bid = F.col("id") * 2 + 1
    else:
        deg = de.groupBy(F.col("src").alias("id")).agg(
            F.count("*").alias("deg")
        )
        bid = F.col("id") * 2
    nodes = deg.withColumn("bid", bid).join(
        comp.withColumnRenamed("id", "bid"), "bid"
    )
    cagg = nodes.groupBy("component").agg(
        F.count("*").alias("n_side"),
        F.sum("deg").alias("deg_sum"),
    )
    tot = nodes.agg(F.count("*").alias("n_total"))
    return (
        nodes.join(cagg, "component")
        .join(F.broadcast(tot))
        .select(
            "id",
            (
                (F.col("n_side") * F.col("deg")).cast("double")
                / (F.col("n_total") * F.col("deg_sum")).cast("double")
            ).alias("score"),
        )
    )
