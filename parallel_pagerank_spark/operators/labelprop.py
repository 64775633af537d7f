"""Label propagation clustering (SURVEY.md §2 E4).

No reference counterpart; mandated by the north rule. Synchronous LPA
(Raghavan et al. 2007, synchronous deterministic variant): every superstep,
each vertex with at least one neighbor adopts the most frequent label among
its neighbors, ties broken by MIN label; isolated vertices keep their own id.
Deterministic by construction (no random visit order). Stops when labels are
globally stable or after ``max_iter`` supersteps (synchronous LPA can
oscillate on bipartite structures, so a fixed cap is part of the contract).

Plan shape per superstep: edges ⋈ labels (gather neighbor labels) →
groupBy(dst, label).count (label frequencies) → per-vertex argmax via
max_by on the (count, -label) pair — a single aggregation, no window sort.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from ..plans.iterate import SuperstepState
from .graph import symmetrize, vertices_from_edges


@dataclass
class LabelPropagationResult:
    labels: DataFrame  # (id: long, label: long)
    supersteps: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def label_propagation(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 10,
    num_partitions: int | None = None,
) -> LabelPropagationResult:
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

    state = SuperstepState(num_parts, "id")
    labels = state.init(
        vertices.select("id", F.col("id").alias("label"))
    )

    metrics: list[dict] = []
    steps = 0
    converged = False
    while steps < max_iter:
        freq = (
            sym.join(
                labels.hint("shuffle_hash"), sym.src == labels.id, "inner"
            )
            .groupBy("dst", "label")
            .agg(F.count("*").alias("cnt"))
        )
        # argmax by (cnt desc, label asc): max_by over the ordered struct
        # (cnt, -label) — one aggregation instead of a window + row_number
        best = freq.groupBy("dst").agg(
            F.max_by(
                F.col("label"),
                F.struct(F.col("cnt"), (-F.col("label")).alias("neg")),
            ).alias("new_label")
        )
        new_labels = (
            labels.select("id", F.col("label").alias("old_label"))
            .join(
                best.hint("shuffle_hash"), labels.id == best.dst, "left"
            )
            .select(
                "id",
                "old_label",
                F.coalesce(F.col("new_label"), F.col("old_label")).alias(
                    "label"
                ),
            )
        )
        new_labels = new_labels.persist(StorageLevel.MEMORY_AND_DISK)
        changed = (
            new_labels.agg(
                F.sum(
                    (F.col("label") != F.col("old_label")).cast("long")
                ).alias("c")
            ).first()["c"]
            or 0
        )
        steps += 1
        metrics.append({"superstep": steps, "changed": int(changed)})
        converged = changed == 0
        labels = state.advance(
            new_labels.select("id", "label"), steps, metrics, converged
        )
        if converged:
            break
    sym.unpersist()
    return LabelPropagationResult(labels, steps, converged, metrics)
