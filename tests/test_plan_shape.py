"""Physical-plan regression tests: the scale-critical plan properties
(SURVEY.md §4.3 / BENCH/BASELINE.md) asserted against explain() output so a
refactor can't silently reintroduce shuffles or row-at-a-time Python.

These inspect plan STRUCTURE, not timings — they run fast on tiny data.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from .conftest import edges_df
from .oracles import SMALL_GRAPH


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_spmv_join_is_coparitioned_zero_shuffle(spark):
    """The per-superstep gather join must not re-shuffle either side when
    edges and ranks are pre-partitioned on the join key: exactly the two
    intended exchanges appear downstream (contribution agg + update
    alignment), and none sit between the persisted inputs and the join."""
    from pyspark.storagelevel import StorageLevel

    P = 8
    edges = (
        edges_df(spark, SMALL_GRAPH)
        .withColumn("w", F.lit(1.0))
        .repartition(P, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    edges.count()
    ranks = (
        spark.range(4)
        .select("id", F.lit(0.25).alias("rank"))
        .repartition(P, "id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ranks.count()
    joined = edges.join(
        ranks.hint("shuffle_hash"), edges.src == ranks.id, "inner"
    )
    plan = _plan(joined)
    # co-partitioned persisted inputs → the join itself introduces NO
    # Exchange. The explain text embeds the cached build lineage (which
    # contains the ONE-TIME repartition exchanges) under InMemoryRelation,
    # so only exchanges ABOVE the first InMemoryRelation are live.
    live = plan.split("InMemoryRelation")[0]
    assert "Exchange" not in live, plan
    assert "ShuffledHashJoin" in live, plan
    assert "BroadcastHashJoin" not in live, plan

    contribs = joined.groupBy("dst").agg(
        F.sum(F.col("rank") * F.col("w")).alias("contrib")
    )
    live2 = _plan(contribs).split("InMemoryRelation")[0]
    # exactly ONE live exchange: the contribution aggregation...
    assert live2.count("Exchange") == 1, live2
    # ...with map-side partial aggregation (partial + final HashAggregate)
    assert live2.count("HashAggregate") == 2, live2
    edges.unpersist()
    ranks.unpersist()


def test_filter_and_projection_pushdown_to_parquet(spark, tmp_path):
    """Predicate + column pruning must reach the parquet scan."""
    path = str(tmp_path / "t")
    spark.range(100).select(
        "id", (F.col("id") * 2).alias("a"), F.lit("x").alias("b")
    ).write.parquet(path)
    df = spark.read.parquet(path).filter(F.col("id") > 50).select("a")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,50)]" in plan, plan
    # pruned read schema: only id (filter) and a (projection), never b
    schema_line = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "b:string" not in schema_line, schema_line
    assert "id:bigint" in schema_line and "a:bigint" in schema_line


def test_whole_stage_codegen_covers_text_analysis(spark):
    """Text analysis must stay inside whole-stage codegen (JVM) — no
    Python evaluation nodes in the plan."""
    from parallel_pagerank_spark.functions.text import analyze_documents

    docs = spark.createDataFrame(
        [(1, "the quick brown fox")], "doc_id long, text string"
    )
    plan = _plan(analyze_documents(docs))
    # formatted mode marks codegen spans with '* ' and '[codegen id : N]'
    assert "[codegen id" in plan, plan
    for marker in ["BatchEvalPython", "ArrowEvalPython", "MapInPandas"]:
        assert marker not in plan, f"{marker} in text-analysis plan"


def test_no_row_at_a_time_python_udfs_anywhere():
    """input_hint contract: vectorized pandas/Arrow UDFs only — the
    codebase must never call pyspark's row-at-a-time udf()."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent
    for py in (root / "parallel_pagerank_spark").rglob("*.py"):
        text = py.read_text()
        assert "F.udf(" not in text and "functions.udf(" not in text, py
        assert "@udf" not in text, py


def test_lsh_selfjoin_reads_cached_signatures(spark):
    """The MinHash signature UDF is the most expensive stage of near-dup —
    both sides of the LSH band self-join must read the persisted signature
    cache (InMemoryTableScan twice), never recompute the UDF per side."""
    from parallel_pagerank_spark.functions.dedup import (
        minhash_lsh_candidates,
    )

    docs = spark.createDataFrame(
        [(i, f"document number {i} with some shared text") for i in range(8)],
        "doc_id long, text string",
    )
    plan = _plan(minhash_lsh_candidates(docs, num_hashes=16, bands=4))
    # both join sides scan the cache (before the fix: zero InMemoryTableScan
    # and the ArrowEvalPython signature stage planned once PER side)
    assert plan.count("InMemoryTableScan") >= 2, plan
    # the only Python eval sits under the cached relation, above no scan
    tree = plan.split("\n(1)")[0]
    assert tree.index("InMemoryTableScan") < tree.index("ArrowEvalPython"), plan


def test_simhash_selfjoin_reads_cached_fingerprints(spark):
    """Same regression for the simhash block-bucket self-join."""
    from parallel_pagerank_spark.functions.dedup import simhash_near_dups

    docs = spark.createDataFrame(
        [(i, f"document number {i} with some shared text") for i in range(8)],
        "doc_id long, text string",
    )
    plan = _plan(simhash_near_dups(docs))
    assert plan.count("InMemoryTableScan") >= 2, plan
    tree = plan.split("\n(1)")[0]
    assert tree.index("InMemoryTableScan") < tree.index("ArrowEvalPython"), plan


def test_dense_id_derivation_no_single_partition_exchange(spark):
    """Dense-id assignment must never funnel data through a one-partition
    window (Exchange SinglePartition): offsets come from range-partitioned
    local cumsums + broadcast per-partition bases."""
    from parallel_pagerank_spark.operators.derive import turn_vertices

    rows = [(f"c{i % 5}", j, "user", "hi", None, None) for i in range(5)
            for j in range(4)]
    tr = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    plan = _plan(turn_vertices(tr, id_mode="dense"))
    assert "SinglePartition" not in plan, plan


def test_topk_plans_take_ordered(spark):
    """top_k_ranks must plan TakeOrderedAndProject (true distributed
    top-k), not a global sort."""
    from parallel_pagerank_spark.operators.pagerank import top_k_ranks

    ranks = spark.range(100).select(
        "id", (F.col("id") % 7).cast("double").alias("rank")
    )
    plan = _plan(top_k_ranks(ranks, 5))
    assert "TakeOrderedAndProject" in plan, plan


def test_bucketed_join_zero_exchange(spark, tmp_path):
    """Two tables bucketed+sorted on the join key must join with NO
    Exchange on either side (durable cross-session co-location — the
    storage-level answer to the per-superstep shuffle)."""
    from parallel_pagerank_spark.sources.bucketed import (
        read_bucketed,
        write_bucketed,
    )

    edges = spark.range(2000).selectExpr(
        "id AS src", "(id * 7) % 500 AS dst"
    )
    ranks = spark.range(500).selectExpr("id AS src", "rand(1) AS rank")
    write_bucketed(
        edges, "e_bucketed", "src", buckets=8,
        path=str(tmp_path / "e"),
    )
    write_bucketed(
        ranks, "r_bucketed", "src", buckets=8,
        path=str(tmp_path / "r"),
    )
    try:
        joined = read_bucketed(spark, "e_bucketed").join(
            read_bucketed(spark, "r_bucketed").hint("merge"), "src"
        )
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        # bucketed scans advertise the bucket count
        assert "Bucketed: true" in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS e_bucketed")
        spark.sql("DROP TABLE IF EXISTS r_bucketed")


def test_cooccurrence_derivation_has_no_join(spark):
    """Skew safety: the co-occurrence edge derivation must be a pure
    window pass — lead(id, k) per successor distance — never a per-user
    self-join (which materializes O(n_u²) candidate pairs per user before
    the distance filter: one 10⁶-event power user would mean 10¹²
    join-loop iterations in a single task). This pins the linear
    formulation feeding triangle_count/clustering_coefficient."""
    import datetime

    from parallel_pagerank_spark.sources.events import cooccurrence_edges

    ev = spark.createDataFrame(
        [
            (i, datetime.datetime(2024, 1, 1, 0, i % 60), f"u{i % 3}", "t")
            for i in range(12)
        ],
        "event_id long, ts timestamp, user_id string, event_type string",
    )
    plan = _plan(cooccurrence_edges(ev, window=2))
    assert "Join" not in plan, plan
    assert "Window" in plan, plan


def test_components_never_materialize_neighborhood_arrays():
    """Hub safety: the components module must never rebuild a vertex
    neighborhood as one array row (collect_set/collect_list) — a
    10^6-degree hub star was verified to complete through
    large_star_small_star with bounded task memory after the join-based
    rewrite; this pins the formulation."""
    import pathlib

    src = (
        pathlib.Path(__file__).resolve().parent.parent
        / "parallel_pagerank_spark" / "operators" / "components.py"
    ).read_text()
    assert "F.collect_set(" not in src and "F.collect_list(" not in src


def test_superstep_loops_truncate_lineage():
    """Plan-growth safety: hits/bfs/paths update loop state from
    expressions that reference the PREVIOUS round's state twice (data +
    total, or settled + anti-join), so an un-truncated logical plan
    DOUBLES per round and driver-side Catalyst analysis goes exponential
    (the hazard documented at operators/pagerank.py:26-31; observed as a
    multi-minute hang by iteration ~10 before the localCheckpoint fix).
    This pins eager localCheckpoint truncation inside each loop body."""
    import pathlib

    ops = pathlib.Path(__file__).resolve().parent.parent / (
        "parallel_pagerank_spark"
    ) / "operators"
    for mod in ("hits.py", "bfs.py", "paths.py"):
        src = (ops / mod).read_text()
        assert "localCheckpoint(eager=True)" in src, mod


def test_jaccard_join_candidates_are_prefix_filtered(spark):
    """Hot-shingle safety: the exact similarity join must generate
    candidates from PREFIX tokens (df-ranked rarest shingles per set),
    never a raw inverted-index self-join — one stop-shingle in d docs
    would otherwise fan out d² candidate pairs (the committed testdata
    has a shingle hitting 80% of documents). The prefix selection is a
    row_number window over (df, shingle) feeding the self-join; this
    pins that shape."""
    from parallel_pagerank_spark.functions.dedup import (
        jaccard_similarity_join,
    )

    docs = spark.createDataFrame(
        [(i, f"common header payload {i}") for i in range(6)],
        "doc_id long, text string",
    )
    out = jaccard_similarity_join(docs, threshold=0.8)
    plan = _plan(out)
    # the window computing the per-set df-rank must sit in the plan
    assert "Window" in plan, plan
    assert "row_number" in plan, plan
    out.unpersist()


def test_katz_superstep_is_single_shuffle(spark):
    """A Katz superstep is ONE gather aggregation — the contribution
    groupBy(dst) — plus the vertex left-join back. The edge side is
    pre-partitioned and persisted, so no per-round edge re-shuffle may
    appear; this is the minimum shuffle count a gather-scatter can do
    and the plan the oracle mirrors."""
    from parallel_pagerank_spark.operators.katz import katz_centrality

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (0, 2)], "src long, dst long"
    )
    res = katz_centrality(e, max_iter=2)
    # scores are checkpointed per round; the final plan must be flat
    # (truncated lineage), not a 2-round join tower
    plan = _plan(res.scores)
    assert plan.count("Exchange") <= 2, plan


def test_sample_fixed_k_plans_take_ordered(spark):
    """sample_fixed_k must plan TakeOrderedAndProject (per-partition
    top-k heap), never a global Sort of the table."""
    from parallel_pagerank_spark.functions.splits import sample_fixed_k

    df = spark.range(100).select(F.col("id").alias("doc_id"))
    plan = _plan(sample_fixed_k(df, 5))
    assert "TakeOrderedAndProject" in plan, plan


def test_sample_subgraph_is_pure_filter(spark):
    """Vertex-induced sampling must be a scan-side predicate: no join
    against a sampled vertex table, no Exchange anywhere."""
    from parallel_pagerank_spark.operators.graph import sample_subgraph

    edges = spark.range(100).select(
        F.col("id").alias("src"), ((F.col("id") * 7) % 100).alias("dst")
    )
    plan = _plan(sample_subgraph(edges, 0.3))
    assert "Join" not in plan, plan
    assert "Exchange" not in plan, plan


def test_decontam_gram_join_is_equi_join(spark):
    """The decontamination join must key on the gram (hash or sort-merge
    equi-join) — never a cartesian/nested-loop pairing of doc sets."""
    from parallel_pagerank_spark.functions.decontam import (
        ngram_contamination,
    )

    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "b c d e")], "doc_id long, text string"
    )
    plan = _plan(ngram_contamination(docs, docs, n=3))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_mis_and_topo_truncate_lineage():
    """Same plan-growth safety as hits/bfs/paths for the round-10/8
    iterative operators (active set / level table referenced twice per
    round)."""
    import pathlib

    ops = pathlib.Path(__file__).resolve().parent.parent / (
        "parallel_pagerank_spark"
    ) / "operators"
    for mod in ("mis.py",):
        src = (ops / mod).read_text()
        assert "localCheckpoint(eager=True)" in src, mod
    scc_src = (ops / "scc.py").read_text()
    topo = scc_src[scc_src.index("def topological_levels") :]
    assert "localCheckpoint(eager=True)" in topo


def test_k_truss_single_full_enumeration(spark, monkeypatch):
    """r3 verdict scale fix: peeling must enumerate the FULL wedge set
    exactly once; every subsequent round derives only the dropped
    frontier's triangles (support maintained by subtraction). A cascade
    graph forces >= 2 peel rounds; _support may still run only once and
    no final recomputation is allowed either."""
    from parallel_pagerank_spark.operators import truss

    calls = {"full": 0}
    real_support = truss._support

    def counting_support(cur):
        calls["full"] += 1
        return real_support(cur)

    monkeypatch.setattr(truss, "_support", counting_support)
    # triangle strip: peeling the (2,4),(3,4) end at k=4 cascades
    strip = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    df = spark.createDataFrame(strip, "src long, dst long")
    res = truss.k_truss(df, k=4)
    res.truss_edges.collect()
    assert res.converged
    assert res.rounds >= 2, "cascade case must take multiple peels"
    assert calls["full"] == 1
    assert res.full_enumerations == 1
