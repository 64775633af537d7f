"""Connected components via iterative min-label propagation (SURVEY.md §2 E3).

No reference counterpart; mandated by the north rule: synchronous min-label
propagation to fixpoint over the undirected edge set, component id = min
vertex id in the component, convergence when zero labels change.

Per superstep: every vertex takes the min of its own label and its
neighbors' labels — a join (edges ⋈ labels on src) + groupBy(dst).min, then
an outer merge with the previous labels. ONE action per superstep (fused
changed-count + not-yet-converged check). Lineage truncated per superstep;
durable parquet checkpoints via the same manifest machinery as PageRank.

Scaling note: plain min-label propagation needs O(diameter) supersteps —
fine for social/web graphs (diameter ~20), slow on path graphs. For
path-heavy inputs use ``large_star_small_star`` below (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — public
algorithm), which converges in O(log^2 n) rounds and returns the identical
min-id labeling.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from ..plans.checkpoint import SuperstepCheckpointer
from .graph import symmetrize, vertices_from_edges


@dataclass
class ComponentsResult:
    components: DataFrame  # (id: long, component: long)
    supersteps: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 200,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 10,
    num_partitions: int | None = None,
) -> ComponentsResult:
    """Synchronous min-label propagation to fixpoint."""
    spark = edges.sparkSession
    num_parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    if vertices is None:
        vertices = vertices_from_edges(edges)
    sym = (
        symmetrize(edges)
        .repartition(num_parts, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sym.count()
    ckpt = SuperstepCheckpointer(checkpoint_dir, "components")

    labels = vertices.select(
        "id", F.col("id").alias("label")
    ).repartition(num_parts, "id")
    labels = labels.localCheckpoint(eager=True)

    metrics: list[dict] = []
    steps = 0
    converged = False
    while steps < max_iter:
        # neighbor minimum: push each vertex's label along every edge,
        # take min at the destination
        neigh_min = (
            sym.join(labels, sym.src == labels.id, "inner")
            .groupBy("dst")
            .agg(F.min("label").alias("neigh_label"))
        )
        new_labels = (
            labels.select("id", F.col("label").alias("old_label"))
            .join(neigh_min, labels.id == neigh_min.dst, "left")
            .select(
                "id",
                "old_label",
                F.least(
                    F.col("old_label"), F.col("neigh_label")
                ).alias("label"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.agg(
                F.sum(
                    (F.col("label") != F.col("old_label")).cast("long")
                ).alias("changed")
            ).first()["changed"]
            or 0
        )
        steps += 1
        metrics.append({"superstep": steps, "changed": int(changed)})
        old = labels
        labels = new_labels.select("id", "label")
        old.unpersist()
        if changed == 0:
            converged = True
        if ckpt.enabled and (
            converged or steps % checkpoint_interval == 0
        ):
            ckpt.save(labels, steps, metrics, converged=converged)
        if converged:
            break
    sym.unpersist()
    return ComponentsResult(
        labels.select("id", F.col("label").alias("component")),
        steps,
        converged,
        metrics,
    )


def large_star_small_star(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 50,
    num_partitions: int | None = None,
) -> ComponentsResult:
    """Alternating large-star / small-star connected components
    (Kiveris et al. SoCC'14): O(log^2 n) rounds on any graph shape.

    State is an edge set (u, v) meaning "u and v are in the same component".
    - large-star: for each u, connect every neighbor v > u to m = min
      neighborhood-with-self; - small-star: connect every neighbor v <= u
      (and u) to m. Fixpoint: every vertex points directly at its component
      min. Returns labels identical to min-label propagation.
    """
    spark = edges.sparkSession
    num_parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    if vertices is None:
        vertices = vertices_from_edges(edges)

    pairs = symmetrize(edges).select("src", "dst")
    pairs = pairs.repartition(num_parts, "src").localCheckpoint(eager=True)

    metrics: list[dict] = []
    steps = 0
    converged = False
    while steps < max_iter:
        # large-star: group by src over symmetric pairs
        grouped = pairs.groupBy("src").agg(
            F.collect_set("dst").alias("nbrs")
        )
        ls = grouped.select(
            "src",
            F.least(F.col("src"), F.array_min("nbrs")).alias("m"),
            F.explode(
                F.filter("nbrs", lambda v: v > F.col("src"))
            ).alias("v"),
        ).select(F.col("v").alias("src"), F.col("m").alias("dst"))
        kept = pairs.filter(F.col("dst") <= F.col("src")).select(
            "src", "dst"
        )
        after_large = (
            ls.unionByName(kept)
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        sym2 = after_large.unionByName(
            after_large.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        ).distinct()
        # small-star: connect all smaller-or-equal neighbors to the min
        grouped2 = (
            sym2.filter(F.col("dst") < F.col("src"))
            .groupBy("src")
            .agg(F.collect_set("dst").alias("nbrs"))
        )
        ss = grouped2.select(
            "src",
            F.array_min("nbrs").alias("m"),
            F.explode(
                F.array_append("nbrs", F.col("src"))
            ).alias("v"),
        ).select(F.col("v").alias("src"), F.col("m").alias("dst"))
        new_pairs = (
            ss.filter(F.col("src") != F.col("dst"))
            .distinct()
            .repartition(num_parts, "src")
        )
        new_pairs = new_pairs.localCheckpoint(eager=True)
        # converged when the pair set is stable (all point at component min)
        diff = (
            new_pairs.exceptAll(pairs).limit(1).count()
            + pairs.exceptAll(new_pairs).limit(1).count()
        )
        steps += 1
        metrics.append({"superstep": steps, "changed": int(diff)})
        old = pairs
        pairs = new_pairs
        old.unpersist()
        if diff == 0:
            converged = True
            break
    comp = (
        vertices.join(
            pairs.select(
                F.col("src").alias("id"), F.col("dst").alias("component")
            ),
            "id",
            "left",
        )
        .groupBy("id")
        .agg(
            F.coalesce(F.min("component"), F.min("id")).alias("component")
        )
    )
    return ComponentsResult(comp, steps, converged, metrics)
