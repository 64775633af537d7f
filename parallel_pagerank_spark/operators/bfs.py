"""Multi-source BFS hop distances by synchronous min-plus supersteps.

No reference counterpart; textbook frontier BFS (e.g. Cormen et al.,
Introduction to Algorithms, ch. 22) in its label-relaxation form: start
every source at distance 0, then per round set
``dist(v) = min(dist(v), min over in-edges (u,v) of dist(u) + 1)``.
After k rounds every vertex within k hops of a source holds its exact
hop distance (monotone relaxation — extra rounds never change a settled
value, so a fixed unrolled oracle deeper than the true eccentricity is
exact).

Superstep shape: one edge⋈frontier join shuffled on dst with a map-side
partial min, then an eager localCheckpoint per round — the same
lineage-truncation discipline as CC/LPA (operators/components.py:261).
The checkpoint is NOT optional: ``settled_k = settled_{k-1} ∪ (frontier
anti-join settled_{k-1})`` references the previous state twice, so an
un-truncated logical plan DOUBLES per round (the hazard documented at
operators/pagerank.py:26-31). Only the FRONTIER (newly settled
vertices) is joined each round, so per-round work is O(edges out of the
frontier), not O(all settled vertices) — at scale this is the
difference between Θ(diameter · E) and Σ|frontier edges| = E total
across the whole run.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel


@dataclass
class BfsResult:
    distances: DataFrame  # (id: long, dist: long) — reached vertices only
    supersteps: int
    converged: bool  # True iff the frontier emptied before max_hops
    metrics: list[dict] = field(default_factory=list)


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 8,
    directed: bool = True,
    num_partitions: int | None = None,
) -> BfsResult:
    """Hop distance from the nearest source along ``edges``.

    sources: DataFrame with an ``id`` column (duplicates fine).
    directed=False symmetrizes first. Unreached vertices are absent from
    the result (callers wanting the dense rule can left-join
    graph.vertices_from_edges)."""
    spark = edges.sparkSession
    num_parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    e = edges.select("src", "dst")
    if not directed:
        e = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.repartition(num_parts, "src").persist(StorageLevel.MEMORY_AND_DISK)
    e.count()
    settled = (
        sources.select("id")
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .repartition(num_parts, "id")
        .localCheckpoint(eager=True)
    )
    n_frontier = settled.count()
    frontier = settled
    metrics: list[dict] = [{"superstep": 0, "frontier": n_frontier}]
    steps = 0
    converged = n_frontier == 0
    while steps < max_hops and n_frontier > 0:
        steps += 1
        # candidates one hop out of the frontier, minus anything already
        # settled (anti-join: settled distances are final — monotonicity);
        # eager localCheckpoint materializes AND truncates lineage
        nxt = (
            e.join(frontier, e.src == frontier.id)
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(settled, "id", "left_anti")
            .withColumn("dist", F.lit(steps).cast("long"))
            .repartition(num_parts, "id")
            .localCheckpoint(eager=True)
        )
        n_frontier = nxt.count()
        settled = settled.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
        metrics.append({"superstep": steps, "frontier": n_frontier})
        if n_frontier == 0:
            converged = True
    e.unpersist()
    return BfsResult(settled.select("id", "dist"), steps, converged, metrics)


def distance_histogram(res: BfsResult) -> DataFrame:
    """(dist, n_vertices) — the shape analysts actually read off a BFS."""
    return (
        res.distances.groupBy("dist")
        .agg(F.count("*").alias("n_vertices"))
        .orderBy("dist")
    )
