"""k-truss decomposition by synchronous support peeling.

No reference counterpart; standard published definition (Cohen 2008,
"Trusses: cohesive subgraphs for social network analysis"; distributed
algorithms in Wang & Cheng, VLDB 2012): the k-truss is the maximal
subgraph in which every edge participates in at least k-2 triangles
*within the subgraph*. Computed by synchronous peeling — repeat
{ count per-edge triangle support; drop edges with support < k-2 }
until no edge drops. A peeled edge can lower its neighbors' support,
so peeling cascades; the fixpoint is unique (truss containment is
monotone under edge deletion), which also makes a fixed-depth unrolled
SQL oracle exact whenever it runs past the measured convergence round.

Superstep shape (scale design): triangles are enumerated ONCE per round
as ordered wedges joined against the closing edge — every triangle
a<b<c appears exactly once because all three edges are canonical
(u < v), so support counting needs no dedup. Two hash joins + one
aggregation per round, all keyed on edge endpoints; the current edge
set is materialized AND lineage-truncated per round with an eager
localCheckpoint (the loop references it four times — three wedge sides
plus the survival join — so an un-truncated plan grows ~4^rounds; the
plan-doubling hazard documented at operators/pagerank.py:26-31). For hub-skewed graphs the wedge join is
the classic candidate for degree orientation (enumerate from the
lower-degree endpoint, triangles.py:34 does this for counting); the
ordered a<b<c form used here keeps support attribution trivially
exact and is the same plan the oracle mirrors.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F


@dataclass
class TrussResult:
    truss_edges: DataFrame  # (u: long, v: long, support: long), u < v
    rounds: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def _support(cur: DataFrame) -> DataFrame:
    """Per-edge triangle support over a canonical (u < v) edge set.
    Edges in no triangle get NO row (support 0)."""
    ab = cur.select(F.col("u").alias("a"), F.col("v").alias("b"))
    bc = cur.select(F.col("u").alias("b"), F.col("v").alias("c"))
    ac = cur.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])
    sides = (
        tri.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(tri.select(F.col("b").alias("u"), F.col("c").alias("v")))
        .unionAll(tri.select(F.col("a").alias("u"), F.col("c").alias("v")))
    )
    return sides.groupBy("u", "v").agg(F.count("*").alias("support"))


def k_truss(
    edges: DataFrame,
    k: int = 3,
    max_rounds: int = 50,
    num_partitions: int | None = None,
) -> TrussResult:
    """k-truss of the UNDIRECTED simple graph under ``edges(src, dst)``
    (direction and multiplicity are ignored: edges are canonicalized to
    distinct u < v pairs; self-loops dropped — a triangle is three
    distinct vertices). k must be >= 3; the 2-truss is the whole simple
    graph."""
    if k < 3:
        raise ValueError(f"k must be >= 3 (the {k}-truss is trivial)")
    spark = edges.sparkSession
    num_parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    s, d = F.col("src"), F.col("dst")
    cur = (
        edges.select(
            F.least(s, d).alias("u"), F.greatest(s, d).alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .repartition(num_parts, "u")
        .localCheckpoint(eager=True)
    )
    n_cur = cur.count()
    metrics: list[dict] = [{"round": 0, "edges": n_cur}]
    rounds = 0
    converged = n_cur == 0
    sup = None
    while rounds < max_rounds and not converged:
        rounds += 1
        sup = _support(cur)
        # eager localCheckpoint: materializes and truncates lineage so the
        # next round plans from a flat LogicalRDD (see module docstring)
        nxt = (
            cur.join(sup.filter(F.col("support") >= k - 2), ["u", "v"])
            .select("u", "v")
            .repartition(num_parts, "u")
            .localCheckpoint(eager=True)
        )
        n_nxt = nxt.count()
        cur = nxt  # old checkpoint RDDs are released by the ContextCleaner
        metrics.append({"round": rounds, "edges": n_nxt})
        if n_nxt == n_cur:
            converged = True
        n_cur = n_nxt
    # final per-edge support within the settled truss (recomputed once so
    # the reported support reflects the SUBGRAPH, not the input graph)
    out = cur.join(_support(cur), ["u", "v"], "left").select(
        "u", "v", F.coalesce("support", F.lit(0)).alias("support")
    )
    return TrussResult(out, rounds, converged, metrics)
