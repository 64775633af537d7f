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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from ..plans.checkpoint import SuperstepCheckpointer
from ..plans.iterate import SuperstepState
from .graph import symmetrize, vertices_from_edges

# vectorized fast path bounds: the label array is O(N) driver memory
# (8 bytes/vertex → 400 MB at 5·10^7), edge arrays O(E)
_FAST_MAX_NODES = 50_000_000


@dataclass
class ComponentsResult:
    components: DataFrame  # (id: long, component: long)
    supersteps: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)
    # "dataframe" = distributed superstep loop (the scale path);
    # "vectorized" = driver-side numpy hook+compress for graphs that fit
    mode: str = "dataframe"


def _route_fast(
    edges: DataFrame,
    vertices: DataFrame | None,
    fast_path_edges: int,
) -> int | None:
    """Return N (=max_id+1) if the vectorized fast path applies, else
    None. Applies only under the default dense-id vertex rule with E and N
    below the in-memory bounds."""
    if vertices is not None or fast_path_edges <= 0:
        return None
    row = edges.agg(
        F.greatest(F.max("src"), F.max("dst")).alias("m"),
        F.least(F.min("src"), F.min("dst")).alias("lo"),
        F.count("*").alias("e"),
    ).first()
    if row["m"] is None:
        return None
    # negative ids would wrap through numpy indexing and silently merge
    # components — only the dense non-negative id space routes; anything
    # else stays on the join-based distributed path (id-agnostic)
    if int(row["lo"]) < 0:
        return None
    n = int(row["m"]) + 1
    if n <= _FAST_MAX_NODES and int(row["e"]) <= fast_path_edges:
        return n
    return None


def _components_fast(
    edges: DataFrame, n: int, max_iter: int
) -> ComponentsResult:
    """Driver-side min-label hook + double pointer-jump (numpy) — same
    fixpoint (component = min vertex id) as the distributed loops, for
    graphs whose edge list fits driver memory. O(E) per round, geometric
    convergence; the per-round hook makes any fixpoint exact.

    Honors the caller's ``max_iter`` exactly like the DataFrame path:
    hitting the cap before the fixpoint returns ``converged=False`` with
    the last labeling (hook rounds converge geometrically, so in practice
    a handful of rounds suffice)."""
    spark = edges.sparkSession
    pdf = edges.select("src", "dst").filter(
        F.col("src") != F.col("dst")
    ).toPandas()
    src = pdf["src"].to_numpy(dtype=np.int64)
    dst = pdf["dst"].to_numpy(dtype=np.int64)
    labels = np.arange(n, dtype=np.int64)
    metrics: list[dict] = []
    steps = 0
    converged = False
    while steps < max_iter:
        new = labels.copy()
        # hook: pull the neighbor's label along both directions
        np.minimum.at(new, dst, labels[src])
        np.minimum.at(new, src, labels[dst])
        # compress twice: label <- label of the vertex the label names
        new = new[new]
        new = new[new]
        changed = int((new != labels).sum())
        steps += 1
        metrics.append({"superstep": steps, "changed": changed})
        if changed == 0:
            converged = True
            break
        labels = new
    out = spark.createDataFrame(
        pd.DataFrame(
            {"id": np.arange(n, dtype=np.int64), "component": labels}
        )
    )
    return ComponentsResult(out, steps, converged, metrics, mode="vectorized")


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 200,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
    num_partitions: int | None = None,
    fast_path_edges: int = 10_000_000,
    resume: bool = False,
) -> ComponentsResult:
    """Synchronous min-label propagation to fixpoint.

    ``resume=True`` continues from the latest durable checkpoint under
    ``checkpoint_dir`` (same manifest contract as PageRank): the label
    snapshot, superstep counter, and per-superstep metrics are restored,
    and a run that had already converged returns immediately.

    Small dense-id graphs (E <= fast_path_edges under the default vertex
    rule, no checkpointing) auto-route to the vectorized fast path — the
    superstep loop below ~10^6 edges is pure per-iteration scheduling
    overhead. DRIVER-MEMORY NOTE: the fast path collects the edge list to
    the driver (~16 bytes/edge as numpy int64 pairs, plus a transient
    Arrow/pandas copy — ~10M edges ≈ a few hundred MB) and holds an O(N)
    label array; on a memory-constrained driver lower ``fast_path_edges``
    or pass 0 to force the fully distributed loop."""
    if checkpoint_dir is None:
        n_fast = _route_fast(edges, vertices, fast_path_edges)
        if n_fast is not None:
            return _components_fast(edges, n_fast, max_iter)
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
    state = SuperstepState(
        num_parts, "id", checkpointer=ckpt,
        truncate_interval=checkpoint_interval,
    )

    metrics: list[dict] = []
    steps = 0
    converged = False
    labels = None
    if resume:
        snap = ckpt.load_latest(spark)
        if snap is not None:
            labels, steps, metrics, was_converged = snap
            if was_converged:
                sym.unpersist()
                return ComponentsResult(
                    labels.select("id", F.col("label").alias("component")),
                    steps,
                    True,
                    metrics,
                )
            labels = state.init(labels.select("id", "label"))
    if labels is None:
        labels = state.init(
            vertices.select("id", F.col("id").alias("label"))
        )
    while steps < max_iter:
        # neighbor minimum: push each vertex's label along every edge,
        # take min at the destination. Both join sides are pre-partitioned
        # on the join key → zero-shuffle join; shuffle_hash avoids sorts.
        neigh_min = (
            sym.join(
                labels.hint("shuffle_hash"), sym.src == labels.id, "inner"
            )
            .groupBy("dst")
            .agg(F.min("label").alias("neigh_label"))
        )
        new_labels = (
            labels.select("id", F.col("label").alias("old_label"))
            .join(
                neigh_min.hint("shuffle_hash"),
                labels.id == neigh_min.dst,
                "left",
            )
            .select(
                "id",
                "old_label",
                F.least(
                    F.col("old_label"), F.col("neigh_label")
                ).alias("label"),
            )
        )
        new_labels = new_labels.persist(StorageLevel.MEMORY_AND_DISK)
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
        converged = changed == 0
        labels = state.advance(
            new_labels.select("id", "label"), steps, metrics, converged
        )
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
    fast_path_edges: int = 10_000_000,
) -> ComponentsResult:
    """Alternating large-star / small-star connected components
    (Kiveris et al. SoCC'14): O(log^2 n) rounds on any graph shape.
    Small dense-id graphs auto-route to the shared vectorized fast path
    (identical labeling); fast_path_edges=0 opts out — see the
    driver-memory note on ``connected_components``.

    State is an edge set (u, v) meaning "u and v are in the same component".
    - large-star: for each u, connect every neighbor v > u to m = min
      neighborhood-with-self; - small-star: connect every neighbor v <= u
      (and u) to m. Fixpoint: every vertex points directly at its component
      min. Returns labels identical to min-label propagation.
    """
    n_fast = _route_fast(edges, vertices, fast_path_edges)
    if n_fast is not None:
        return _components_fast(edges, n_fast, max_iter)
    spark = edges.sparkSession
    num_parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    if vertices is None:
        vertices = vertices_from_edges(edges)

    # state: pairs (hi, lo) with hi > lo meaning "same component"; the
    # initial orientation of every undirected edge is (max, min)
    pairs = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("hi"),
            F.least("src", "dst").alias("lo"),
        )
        .distinct()
        .repartition(num_parts, "hi")
        .localCheckpoint(eager=True)
    )
    n_pairs = pairs.count()

    metrics: list[dict] = []
    steps = 0
    converged = False
    while steps < max_iter:
        # large-star: for every node u over its FULL neighborhood, attach
        # each strictly-larger neighbor v to m = min(neighborhood ∪ {u})
        # NO neighborhood arrays anywhere: a 10^8-degree hub must never
        # become one multi-GB collect_set row. Both stars are expressed as
        # (flat edge set) ⋈ (per-vertex min) — every row stays O(1).
        sym = pairs.select(
            F.col("hi").alias("u"), F.col("lo").alias("v")
        ).unionByName(
            pairs.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        )
        m_of_u = (
            sym.groupBy("u")
            .agg(F.min("v").alias("minv"))
            .select("u", F.least("u", "minv").alias("m"))
        )
        ls = (
            sym.filter(F.col("v") > F.col("u"))
            .join(m_of_u, "u")
            # v > u >= m ⇒ orientation (hi=v, lo=m); drop self-pairs
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .distinct()
        )
        # small-star: for every node u over its strictly-smaller neighbors N
        # (edges are (hi, lo)-oriented, so N = lo-set grouped by hi), attach
        # u and all of N to m = min(N)
        m_of_hi = ls.groupBy("hi").agg(F.min("lo").alias("m"))
        ss = (
            ls.join(m_of_hi, "hi")
            .filter(F.col("lo") != F.col("m"))
            .select(F.col("lo").alias("v"), "m")
            .unionByName(
                m_of_hi.select(F.col("hi").alias("v"), "m")
            )
        ).select(F.col("v").alias("hi"), F.col("m").alias("lo"))
        new_pairs = (
            ss.filter(F.col("hi") != F.col("lo"))
            .distinct()
            .repartition(num_parts, "hi")
            .localCheckpoint(eager=True)
        )
        # converged when the pair set is stable: a star forest rooted at
        # each component's minimum id. Both sides are DISTINCT sets, so
        # |new| == |old| plus one empty anti-join (new ⊆ old) proves
        # equality — the count is nearly free on the just-checkpointed
        # data and the anti-join probe only runs when the counts agree,
        # so fixpoint detection costs ONE extra shuffle on the final
        # round instead of two exceptAll shuffles on every round.
        n_new = new_pairs.count()
        diff = 1
        if n_new == n_pairs:
            diff = (
                new_pairs.join(pairs, ["hi", "lo"], "left_anti")
                .limit(1)
                .count()
            )
        steps += 1
        metrics.append(
            {"superstep": steps, "changed": int(abs(n_new - n_pairs) or diff)}
        )
        old = pairs
        pairs = new_pairs
        n_pairs = n_new
        old.unpersist()
        if diff == 0:
            converged = True
            break
    comp = (
        vertices.join(
            pairs.select(
                F.col("hi").alias("id"), F.col("lo").alias("component")
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


def connected_components_incremental(
    prev_labels: DataFrame,
    new_edges: DataFrame,
    **kwargs,
) -> "ComponentsResult":
    """Incremental connected components after an edge-batch append — the
    crawl-refresh / snapshot-update path (the link graph grows every
    ingest; recomputing over the full historical edge set rescans data
    whose connectivity is already known).

    ``prev_labels`` is an earlier run's ``(id, component)`` frame (any
    labeling where the label is the component's minimum member id —
    what every operator in this module produces). Each label row is
    re-read as an edge ``id → component``: a diameter-≤2 star that
    summarizes the old snapshot's connectivity exactly, so

        CC(prev_labels-as-edges  ∪  new_edges)
          ==  CC(old_edges ∪ new_edges)

    vertex-for-vertex (labels are min member ids, so the union graph's
    min-label components coincide with the full graph's). The win at
    scale: the old side shrinks from |E_old| rows to |V_old| rows, and
    its star shape means supersteps are spent only on the connectivity
    the NEW batch actually changes.

    Plain composition over :func:`connected_components`; all its
    routing, checkpointing, and ``**kwargs`` apply unchanged.
    """
    star = prev_labels.select(
        F.col("id").cast("long").alias("src"),
        F.col("component").cast("long").alias("dst"),
    )
    union = star.unionByName(
        new_edges.select(
            F.col("src").cast("long"), F.col("dst").cast("long")
        )
    )
    return connected_components(union, **kwargs)
