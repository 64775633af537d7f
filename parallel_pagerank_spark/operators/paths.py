"""Bounded weighted single-source(-set) shortest paths by min-plus
Bellman-Ford supersteps.

No reference counterpart; textbook label-correcting relaxation (Cormen
et al., Introduction to Algorithms, ch. 24, Bellman-Ford): after k
rounds every vertex holds the minimum weight over paths of at most k
edges from the nearest source — the bounded-hop generalization of
operators/bfs.py from hop counts to additive edge weights.

Superstep shape mirrors bfs.py: only the FRONTIER (vertices whose
distance improved last round) is joined against the edge table, so
per-round work is O(edges out of the frontier); the distance table is
updated by anti-join ∪ improved rows (no full re-aggregation of settled
state) and eagerly localCheckpoint-ed per round — the update references
the previous distance table twice, so an un-truncated logical plan
DOUBLES per round (the hazard documented at operators/pagerank.py:26-31).
With integer-valued double weights every sum and min is exact
in IEEE double (up to 2^53), so a fixed-round run is hash-comparable
against an unrolled dense-relaxation SQL oracle — the frontier
optimization computes the identical d_k(v) = min(d_{k-1}(v),
min_{(u,v)∈E} d_{k-1}(u) + w(u,v)) fixpoint prefix.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel


@dataclass
class SsspResult:
    distances: DataFrame  # (id: long, dist: double) — reached only
    supersteps: int
    converged: bool  # True iff no distance improved before max_rounds
    metrics: list[dict] = field(default_factory=list)


def sssp_distances(
    edges: DataFrame,
    sources: DataFrame,
    weight_col: str | None = None,
    max_rounds: int = 8,
    num_partitions: int | None = None,
) -> SsspResult:
    """Minimum path weight from the nearest source within ``max_rounds``
    edges, along directed ``edges``.

    sources: DataFrame with an ``id`` column (duplicates fine).
    weight_col: positive edge-weight column; None ⇒ unit weights (then
    this is BFS with a double-typed distance). Unreached vertices are
    absent from the result. Negative weights are rejected — with a
    bounded round count Bellman-Ford would still be well-defined, but
    no caller of a *shortest-path* API wants silently negative cycles.
    """
    spark = edges.sparkSession
    num_parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0)
    )
    e = edges.select("src", "dst", w.alias("w"))
    e = e.repartition(num_parts, "src").persist(StorageLevel.MEMORY_AND_DISK)
    if weight_col is not None:
        row = e.agg(F.min("w").alias("wmin")).first()
        if row["wmin"] is not None and row["wmin"] < 0:
            e.unpersist()
            raise ValueError(
                f"sssp_distances requires non-negative weights "
                f"(found min={row['wmin']})"
            )
    else:
        e.count()
    dist = (
        sources.select("id")
        .distinct()
        .withColumn("dist", F.lit(0.0))
        .repartition(num_parts, "id")
        .localCheckpoint(eager=True)
    )
    n_frontier = dist.count()
    frontier = dist
    metrics: list[dict] = [{"superstep": 0, "improved": n_frontier}]
    steps = 0
    converged = n_frontier == 0
    while steps < max_rounds and n_frontier > 0:
        steps += 1
        # best candidate distance through the frontier, map-side partial
        # min; eager localCheckpoint materializes AND truncates lineage
        cand = (
            e.join(frontier, e.src == frontier.id)
            .select(
                F.col("dst").alias("id"),
                (F.col("dist") + F.col("w")).alias("cand"),
            )
            .groupBy("id")
            .agg(F.min("cand").alias("cand"))
        )
        improved = (
            cand.join(dist, "id", "left")
            .filter(F.col("dist").isNull() | (F.col("cand") < F.col("dist")))
            .select("id", F.col("cand").alias("dist"))
            .repartition(num_parts, "id")
            .localCheckpoint(eager=True)
        )
        n_frontier = improved.count()
        if n_frontier == 0:
            converged = True
            metrics.append({"superstep": steps, "improved": 0})
            break
        dist = (
            dist.join(improved, "id", "left_anti")
            .unionByName(improved)
            .localCheckpoint(eager=True)
        )
        frontier = improved
        metrics.append({"superstep": steps, "improved": n_frontier})
    e.unpersist()
    return SsspResult(dist.select("id", "dist"), steps, converged, metrics)
