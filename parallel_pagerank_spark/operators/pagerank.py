"""Power-iteration PageRank as DataFrame-level sparse gather-scatter.

Reference semantics: /root/reference/pagerank_mpi/pagerank_mpi.c:132-231
(Distributed_PageRank_csr) — init 1/N, per iteration dangling-mass
redistribution, p' = d*(contrib + S/N) + (1-d)/N, stop when L1 < tol checked
after the update. The MPI code materializes the FULL rank vector on every rank
per iteration (MPI_Allgatherv, pagerank_mpi.c:141-164) and re-scans ALL edges
on every rank (178-192); the Spark plan instead partitions both data and
compute: the SpMV is an equi-join (edges ⋈ ranks on src) followed by a
hash aggregation on dst with map-side partial aggregation — the same
partial/final split the MPI code does by hand with p_t1_local.

Physical layout (SURVEY.md §4.3):
- ``edges`` are weighted once with 1/out_degree, hash-repartitioned by src,
  and persisted: iteration-invariant, shuffled exactly once.
- ``ranks`` carries an iteration-invariant ``dangling`` flag so the dangling
  sum (pagerank_mpi.c:166-174) never needs a join.
- ONE Spark action per superstep: a fused aggregate computing L1, max-error
  (pagerank_mpi.c:201-213) AND the next iteration's dangling sum.
- ranks stay hash-partitioned on id across supersteps (persist retains the
  partitioning, unlike localCheckpoint which degrades the DataFrame to a
  bare RDD scan and forces a re-Exchange per join): the SpMV join is then
  zero-shuffle (edges hash(src,P) x ranks hash(id,P)) and an iteration
  pays exactly two exchanges — the contribution aggregation and the
  aggregated contribs into the update join.
- lineage/plan growth is truncated every ``checkpoint_interval`` supersteps
  by a parquet round-trip; with a configured checkpoint_dir those parquet
  snapshots double as the durable resume points (JSON manifest with
  per-partition lineage + metrics, north rule). The interval is a real
  knob: ranks feed BOTH the gather join and the update join, so the
  un-truncated logical plan DOUBLES per superstep — driver-side Catalyst
  analysis is O(2^interval) between truncations (measured: interval 7 ≈
  6× the per-superstep driver cost of interval 5 on a tiny graph where
  analysis dominates). Keep it small; 5 is the default.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from ..config import PageRankConfig
from ..plans.checkpoint import SuperstepCheckpointer
from .graph import out_degrees, vertices_from_edges


@dataclass
class PageRankResult:
    ranks: DataFrame  # (id: long, rank: double)
    iterations: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)
    # which execution path produced the result: "dataframe" (distributed
    # superstep loop — the 100 TB scale path) or "vectorized" (Arrow/numpy
    # fast path for rank vectors that fit driver memory)
    mode: str = "dataframe"


def _prepare_weighted_edges(
    edges: DataFrame,
    num_partitions: int,
    salt_buckets: int,
    partition_key: str = "src",
    weight_col: str | None = None,
) -> tuple[DataFrame, DataFrame | None]:
    """edges ⋈ out_deg once (iteration-invariant — pagerank_mpi.c:179 computes
    row_ptr[j+1]-row_ptr[j] per edge per iteration; we fold it into a
    precomputed weight column w = 1/out_deg).

    With ``weight_col`` set (WEIGHTED PageRank — extension beyond the
    reference's uniform 1/out_deg split), each edge carries
    w = weight / Σ weights(src): rank flows proportionally to edge weight.
    Weights must be positive; a duplicated unweighted edge is exactly
    equivalent to one edge of weight 2 (multi-edge semantics preserved).

    Hub-skew salting (north rule; the reference's contiguous ranges make
    hub skew WORSE — SURVEY.md §4.1): with salt_buckets = s > 0, vertices
    whose out-degree exceeds ~(E / num_partitions) get their edge sets
    split across s salt values; the per-iteration join key becomes
    (src, salt) so one hub no longer pins a whole partition. The ranks side
    is replicated s× for hub ids only (a small broadcast-joined dimension).
    Returns (weighted edges with salt column, hub-id DataFrame or None).
    """
    aggs = [F.count("*").alias("out_deg")]
    if weight_col is not None:
        # weights must be strictly positive and non-null: a zero/negative
        # weight (or a src whose weights sum to 0) would yield null or
        # negative w = weight/wsum, and null contributions are silently
        # dropped by the SpMV sum — rank mass lost with no signal. One
        # cheap column scan, mirroring the teleport-weight validation.
        wrow = edges.agg(
            F.min(weight_col).alias("wmin"),
            F.sum(F.col(weight_col).isNull().cast("long")).alias("nnull"),
        ).first()
        if (wrow["nnull"] or 0) > 0 or (
            wrow["wmin"] is not None and wrow["wmin"] <= 0
        ):
            raise ValueError(
                f"pagerank weight_col={weight_col!r} must be strictly "
                f"positive and non-null (found min={wrow['wmin']}, "
                f"nulls={wrow['nnull']})"
            )
        aggs.append(F.sum(weight_col).alias("wsum"))
    deg = edges.groupBy(F.col("src").alias("id")).agg(*aggs)
    w = edges.join(
        deg.withColumnRenamed("id", "src"), on="src", how="inner"
    )
    w_expr = (
        (F.lit(1.0) / F.col("out_deg"))
        if weight_col is None
        else (F.col(weight_col).cast("double") / F.col("wsum"))
    )
    if salt_buckets <= 1:
        return (
            w.select(
                "src",
                "dst",
                w_expr.alias("w"),
                F.lit(0).alias("salt"),
            ).repartition(num_partitions, partition_key),
            None,
        )
    total = edges.count()
    hub_threshold = max(32, total // num_partitions)
    hubs = deg.filter(F.col("out_deg") > hub_threshold).select("id")
    salted = w.select(
        "src",
        "dst",
        w_expr.alias("w"),
        F.when(
            F.col("out_deg") > hub_threshold,
            F.pmod(F.xxhash64("dst"), F.lit(salt_buckets)).cast("int"),
        )
        .otherwise(F.lit(0))
        .alias("salt"),
    )
    return salted.repartition(num_partitions, "src", "salt"), hubs


def pagerank(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    config: PageRankConfig | None = None,
    resume: bool = False,
    teleport: DataFrame | None = None,
    weight_col: str | None = None,
    init_ranks: DataFrame | None = None,
) -> PageRankResult:
    """Run PageRank over ``edges(src, dst)``.

    weight_col: optional positive edge-weight column → WEIGHTED PageRank:
    rank flows from src proportionally to weight/Σweights(src) instead of
    uniformly 1/out_deg. A vertex is dangling iff it has no out-edges.

    vertices: optional explicit ``(id)`` DataFrame. Default reproduces the
    reference's dense-id rule (csr_graph.c:27): ids 0..max_id all exist.
    resume: continue from the latest durable checkpoint under
    ``config.checkpoint_dir`` if one exists.
    teleport: optional ``(id, weight)`` DataFrame → PERSONALIZED PageRank:
    p' = d·(contrib + S·v) + (1−d)·v with v the normalized weight vector.
    The reference declares exactly this per-vertex teleport field
    (``Node.e``, pagerank_mpi.h:13, initialized to 1/N at
    pagerank_mpi.c:51) but never uses it after init — this implements the
    declared intent; ``teleport=None`` is the reference's uniform v=1/N
    behavior. Vertices absent from ``teleport`` get weight 0.
    init_ranks: optional ``(id, rank)`` DataFrame to WARM-START from —
    e.g. the previous snapshot's converged ranks after an incremental
    edge batch. The vector is L1-normalized to 1 (power iteration is
    mass-conserving, so any positive total is a valid start); vertices
    absent from it start at 0 and regain mass through teleport. The
    fixpoint is start-independent (the chain is ergodic for d < 1), so
    a warm start changes ONLY the iteration count — on slowly-drifting
    graphs typically a handful of supersteps instead of ~57, which at
    100 TB is the difference between minutes and an hour.
    """
    cfg = config or PageRankConfig()
    spark = edges.sparkSession
    num_parts = cfg.num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    d = cfg.damping

    default_dense_vertices = vertices is None
    if vertices is None:
        vertices = vertices_from_edges(edges)
    n = vertices.count()
    if n == 0:
        empty = spark.createDataFrame([], "id long, rank double")
        return PageRankResult(empty, 0, True, [])

    # auto-route small dense-id graphs to the vectorized fast path: below
    # ~10^6 vertices the superstep loop is pure scheduling overhead
    # (~0.3-0.5 s/iteration regardless of data). Only when nothing requires
    # the distributed machinery — default dense vertex rule, uniform
    # teleport, unweighted, no checkpoint/resume/salting, mode "auto".
    if (
        default_dense_vertices
        and cfg.spmv_mode == "auto"
        and 0 < n <= cfg.fast_path_threshold
        and teleport is None
        and weight_col is None
        and init_ranks is None
        and not resume
        and cfg.checkpoint_dir is None
        and cfg.salt_buckets == 0
    ):
        lo = edges.agg(
            F.least(F.min("src"), F.min("dst")).alias("lo")
        ).first()["lo"]
        # negative ids fall outside the dense 0..max_id space the numpy
        # kernels index into — keep those on the DataFrame loop
        if lo is not None and lo >= 0:
            from .pagerank_fast import pagerank_vectorized

            return pagerank_vectorized(
                edges, vertices=vertices, config=cfg
            )

    use_broadcast = cfg.spmv_mode == "broadcast" or (
        cfg.spmv_mode == "auto" and n <= cfg.broadcast_threshold
    )
    edges_w, hubs = _prepare_weighted_edges(
        edges,
        num_parts,
        0 if use_broadcast else cfg.salt_buckets,
        partition_key="dst" if use_broadcast else "src",
        weight_col=weight_col,
    )
    edges_w = edges_w.persist(StorageLevel.MEMORY_AND_DISK)
    edges_w.count()  # materialize once
    if hubs is not None:
        hubs = hubs.withColumn("is_hub", F.lit(True)).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        hubs.count()

    ckpt = SuperstepCheckpointer(cfg.checkpoint_dir, "pagerank")

    start_iter = 0
    metrics: list[dict] = []
    ranks = None
    if resume:
        state = ckpt.load_latest(spark)
        if state is not None:
            ranks, start_iter, metrics, was_converged = state
            if was_converged:
                edges_w.unpersist()
                return PageRankResult(
                    ranks.select("id", "rank"), start_iter, True, metrics
                )
            ranks = ranks.repartition(num_parts, "id")

    if ranks is None:
        # init p = 1/N (pagerank_mpi.c:44-54); dangling flag = no out-edges
        # (pagerank_mpi.c:169) — iteration-invariant, carried on the rank row.
        deg = out_degrees(edges)
        if teleport is not None:
            total_w = teleport.agg(F.sum("weight").alias("s")).first()["s"]
            if not total_w or total_w <= 0:
                raise ValueError("teleport weights must sum to > 0")
            tele = teleport.select(
                "id", (F.col("weight") / total_w).alias("tele")
            )
            base = vertices.join(tele, "id", "left").select(
                "id", F.coalesce("tele", F.lit(0.0)).alias("tele")
            )
        else:
            base = vertices.select(
                "id", F.lit(1.0 / n).alias("tele")
            )
        if init_ranks is not None:
            total_r = init_ranks.agg(F.sum("rank").alias("s")).first()["s"]
            if not total_r or total_r <= 0:
                raise ValueError("init_ranks must sum to > 0")
            warm = init_ranks.select(
                "id", (F.col("rank") / F.lit(float(total_r))).alias("warm")
            )
            base = base.join(warm, "id", "left")
            init_col = F.coalesce("warm", F.lit(0.0)).alias("rank")
        else:
            init_col = F.col("tele").alias("rank")  # init p = v (uniform:
            # 1/N, pagerank_mpi.c:44-54)
        ranks = (
            base.join(deg, on="id", how="left")
            .select(
                "id",
                init_col,
                F.col("tele"),
                F.col("out_deg").isNull().alias("dangling"),
            )
            .repartition(num_parts, "id")
        )
    ranks = ranks.persist(StorageLevel.MEMORY_AND_DISK)

    # initial dangling sum: every dangling vertex holds exactly 1/N
    srow = ranks.agg(
        F.sum(F.when(F.col("dangling"), F.col("rank"))).alias("s")
    ).first()
    dangling_sum = srow["s"] or 0.0

    # lineage-truncation scratch dir: reuse the durable checkpoint dir when
    # configured, else a session-temp dir (plan depth must stay bounded —
    # Catalyst has no fixpoint operator, SURVEY.md §4.3)
    import shutil
    import tempfile

    scratch = None
    prev_scratch_path = None
    if not ckpt.enabled:
        scratch = tempfile.mkdtemp(prefix="ppr_truncate_")

    converged = False
    it = start_iter
    while it < cfg.max_iter:
        t0 = time.monotonic()
        # SpMV gather (pagerank_mpi.c:176-192): join pulls rank[src] to each
        # edge; hash-agg on dst scatter-sums the contributions with map-side
        # partial aggregation. Both sides are pre-partitioned on their join
        # key (edges hash(src,P) persisted, ranks hash(id,P) persisted) →
        # zero-shuffle join; shuffle_hash avoids SMJ sorts.
        if use_broadcast:
            # zero-shuffle superstep: edges are dst-partitioned and cached;
            # ranks broadcast into the gather join (streamed-side
            # partitioning is preserved, so the dst aggregation needs no
            # exchange and the update join is already aligned)
            gather_side = F.broadcast(ranks)
            cond = edges_w.src == ranks.id
        elif hubs is None:
            gather_side = ranks
            cond = edges_w.src == gather_side.id
        else:
            # replicate hub ranks across salt buckets (hubs is tiny →
            # broadcast); the (src, salt) join key splits each hub's edges
            # over salt_buckets partitions
            gather_side = (
                ranks.join(F.broadcast(hubs), "id", "left")
                .select(
                    "id",
                    "rank",
                    F.explode(
                        F.when(
                            F.col("is_hub").isNotNull(),
                            F.sequence(
                                F.lit(0), F.lit(cfg.salt_buckets - 1)
                            ),
                        ).otherwise(F.array(F.lit(0)))
                    ).alias("rsalt"),
                )
            )
            cond = (edges_w.src == gather_side.id) & (
                edges_w.salt == gather_side.rsalt
            )
        joined = (
            edges_w.join(gather_side, cond, "inner")
            if use_broadcast
            else edges_w.join(gather_side.hint("shuffle_hash"), cond, "inner")
        )
        contribs = joined.groupBy("dst").agg(
            F.sum(F.col("rank") * F.col("w")).alias("contrib")
        )
        # update (pagerank_mpi.c:194-196): contribs arrive hash(dst,P) from
        # the aggregation exchange — aligns with ranks hash(id,P)
        new_ranks = (
            ranks.select(
                "id", "dangling", "tele", F.col("rank").alias("old_rank")
            )
            .join(
                contribs.hint("shuffle_hash"),
                ranks.id == contribs.dst,
                "left",
            )
            .select(
                "id",
                "dangling",
                "tele",
                "old_rank",
                (
                    d
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.lit(dangling_sum) * F.col("tele")
                    )
                    + F.lit(1.0 - d) * F.col("tele")
                ).alias("rank"),
            )
        )
        new_ranks = new_ranks.persist(StorageLevel.MEMORY_AND_DISK)
        # ONE action: fused convergence metrics (pagerank_mpi.c:201-213,
        # D3+D4) + next iteration's dangling sum; materializes new_ranks.
        row = new_ranks.agg(
            F.sum(F.abs(F.col("rank") - F.col("old_rank"))).alias("l1"),
            F.max(F.abs(F.col("rank") - F.col("old_rank"))).alias("max_err"),
            F.sum(F.when(F.col("dangling"), F.col("rank"))).alias("s"),
        ).first()
        l1, max_err = float(row["l1"]), float(row["max_err"])
        dangling_sum = float(row["s"] or 0.0)
        it += 1
        wall_ms = (time.monotonic() - t0) * 1000.0
        metrics.append(
            {"iteration": it, "l1": l1, "max_err": max_err, "wall_ms": wall_ms}
        )
        old = ranks
        ranks = new_ranks.select("id", "rank", "dangling", "tele")
        # stop when L1 < threshold, checked after the update
        # (pagerank_mpi.c:220-226; L1 is the operative criterion)
        if l1 < cfg.tol:
            converged = True
        truncate = converged or it % cfg.checkpoint_interval == 0
        if truncate:
            if ckpt.enabled:
                ckpt.save(ranks, it, metrics, converged=converged)
                path = ckpt.step_path(it)
            else:
                path = f"{scratch}/step_{it:06d}"
                ranks.write.mode("overwrite").parquet(path)
            # parquet round-trip: bounded plan depth + stable partitioning
            new_ranks.unpersist()
            ranks = (
                spark.read.parquet(path)
                .repartition(num_parts, "id")
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            ranks.count()
            # prune the previous scratch snapshot (keep the live one — the
            # returned DataFrame's cache may refill from it)
            if prev_scratch_path is not None:
                shutil.rmtree(prev_scratch_path, ignore_errors=True)
            if not ckpt.enabled:
                prev_scratch_path = path
        old.unpersist()
        if converged:
            break

    edges_w.unpersist()
    return PageRankResult(
        ranks.select("id", "rank"), it, converged, metrics
    )


def top_k_ranks(result_ranks: DataFrame, k: int = 10) -> DataFrame:
    """Top-k vertices by rank (dashboard/app.py:400-404). Spark plans
    TakeOrderedAndProject — a true distributed top-k, no full sort."""
    return result_ranks.orderBy(F.desc("rank"), F.asc("id")).limit(k)
