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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from ..plans.iterate import SuperstepState
from .components import _route_fast
from .graph import symmetrize, vertices_from_edges


@dataclass
class LabelPropagationResult:
    labels: DataFrame  # (id: long, label: long)
    supersteps: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)
    mode: str = "dataframe"  # or "vectorized" (driver-side numpy fast path)


def _label_propagation_fast(
    edges: DataFrame, n: int, max_iter: int
) -> LabelPropagationResult:
    """Driver-side synchronous LPA (numpy) — EXACTLY the distributed
    semantics: per step every vertex with >=1 neighbor takes the most
    frequent neighbor label, ties to the MIN label; early stop when
    stable. Per-step cost: one lexsort over the symmetric edge list."""
    spark = edges.sparkSession
    pdf = edges.select("src", "dst").filter(
        F.col("src") != F.col("dst")
    ).toPandas()
    s = pdf["src"].to_numpy(dtype=np.int64)
    d = pdf["dst"].to_numpy(dtype=np.int64)
    # symmetrize + dedup, mirroring graph.symmetrize(): each undirected
    # neighbor counts ONCE per direction
    key = np.unique(
        np.concatenate([s * n + d, d * n + s])
    )
    u = key // n
    v = key % n
    labels = np.arange(n, dtype=np.int64)
    metrics: list[dict] = []
    steps = 0
    converged = False
    while steps < max_iter:
        lab = labels[v]  # neighbor labels gathered at u
        order = np.lexsort((lab, u))
        uu, ll = u[order], lab[order]
        brk = np.nonzero((uu[1:] != uu[:-1]) | (ll[1:] != ll[:-1]))[0] + 1
        starts = np.concatenate([[0], brk]) if len(uu) else np.array([], int)
        counts = np.diff(np.append(starts, len(uu)))
        guu, gll = uu[starts], ll[starts]
        # argmax per vertex by (count desc, label asc): groups are already
        # label-ascending within each uu, so a stable sort by -count keeps
        # the min label first among equal counts
        o2 = np.lexsort((gll, -counts, guu))
        first = (
            np.concatenate([[True], guu[o2][1:] != guu[o2][:-1]])
            if len(o2)
            else np.array([], bool)
        )
        new_labels = labels.copy()
        new_labels[guu[o2][first]] = gll[o2][first]
        changed = int((new_labels != labels).sum())
        steps += 1
        metrics.append({"superstep": steps, "changed": changed})
        converged = changed == 0
        labels = new_labels
        if converged:
            break
    out = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(n, dtype=np.int64), "label": labels})
    )
    return LabelPropagationResult(
        out, steps, converged, metrics, mode="vectorized"
    )


def label_propagation(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 10,
    num_partitions: int | None = None,
    fast_path_edges: int = 10_000_000,
) -> LabelPropagationResult:
    """Synchronous LPA. Small dense-id graphs auto-route to the vectorized
    fast path (identical labels per step); fast_path_edges=0 opts out."""
    n_fast = _route_fast(edges, vertices, fast_path_edges)
    if n_fast is not None:
        return _label_propagation_fast(edges, n_fast, max_iter)
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
