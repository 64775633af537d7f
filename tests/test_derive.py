"""Transcript → edge derivation (E1) and the per-turn text-equality
invariant (E2, BASELINE.json input_hint)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parallel_pagerank_spark.operators.derive import (
    derive_edges,
    turn_vertices,
)
from parallel_pagerank_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    synthetic_transcripts,
)


@pytest.fixture(scope="module")
def transcripts(spark):
    return synthetic_transcripts(spark, n_conversations=40, seed=42).cache()


def test_reply_links_consecutive_turns(spark, transcripts):
    edges = derive_edges(transcripts, handoff_links=False, id_mode="dense")
    n_rows = transcripts.count()
    n_convs = transcripts.select("conv_id").distinct().count()
    # one reply link per consecutive turn pair
    assert edges.count() == n_rows - n_convs
    # dense ids: within a conversation dst = src + 1
    bad = edges.filter(F.col("dst") != F.col("src") + 1).count()
    assert bad == 0


def test_handoff_links_share_tool(spark, transcripts):
    edges = derive_edges(transcripts, reply_links=False, id_mode="dense")
    n_tool_turns = transcripts.filter(F.col("tool").isNotNull()).count()
    n_tools = (
        transcripts.filter(F.col("tool").isNotNull())
        .select("tool")
        .distinct()
        .count()
    )
    assert edges.count() == n_tool_turns - n_tools


def test_dense_ids_are_dense_and_stable(spark, transcripts):
    v = turn_vertices(transcripts, id_mode="dense")
    n = transcripts.count()
    ids = [r["id"] for r in v.select("id").collect()]
    assert sorted(ids) == list(range(n))
    # deterministic: same ids on recomputation
    ids2 = [r["id"] for r in v.select("id").collect()]
    assert sorted(ids2) == sorted(ids)
    # ordering follows (conv_id, turn_idx)
    rows = v.orderBy("id").collect()
    keys = [(r["conv_id"], r["turn_idx"]) for r in rows]
    assert keys == sorted(keys)


def test_hash_ids_unique(spark, transcripts):
    v = turn_vertices(transcripts, id_mode="hash")
    assert v.select("id").distinct().count() == transcripts.count()


def test_text_equality_invariant(spark, transcripts):
    """E2: deriving edges must not lose/reorder/mutate text — round-trip the
    transcript through the derivation-joined form and compare under the
    stable (conv_id, turn_idx) ordering."""
    before = [
        r["text"]
        for r in transcripts.orderBy("conv_id", "turn_idx")
        .select("text")
        .collect()
    ]
    joined = transcripts.join(
        turn_vertices(transcripts, id_mode="hash"),
        ["conv_id", "turn_idx"],
    )
    after = [
        r["text"]
        for r in joined.orderBy("conv_id", "turn_idx").select("text").collect()
    ]
    assert before == after


def test_duplicate_link_multiplicity(spark):
    # a turn pair linked by both reply and handoff yields TWO edges
    # (reference multi-edge semantics, csr_graph.c:19-23)
    rows = [
        ("c1", 0, "assistant", "t0", "search", "2026-01-01T00:00:00"),
        ("c1", 1, "assistant", "t1", "search", "2026-01-01T00:00:01"),
    ]
    df = spark.createDataFrame(
        [(c, i, r, t, tl, __import__("datetime").datetime.fromisoformat(ts))
         for c, i, r, t, tl, ts in rows],
        TRANSCRIPT_SCHEMA,
    )
    edges = derive_edges(df, id_mode="dense")
    assert edges.count() == 2
    assert edges.distinct().count() == 1


def test_empty_and_single_turn_conversations(spark):
    import datetime

    rows = [
        ("c1", 0, "user", "only", None, datetime.datetime(2026, 1, 1)),
        ("c2", 0, "user", "a", None, datetime.datetime(2026, 1, 2)),
        ("c2", 1, "assistant", "b", None, datetime.datetime(2026, 1, 3)),
    ]
    df = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    edges = derive_edges(df, id_mode="dense")
    assert edges.count() == 1  # only c2's consecutive pair


def test_hash_ids_fail_fast_on_dense_vertex_rule(spark, transcripts):
    """The flagship composition pagerank(derive_edges(tx)) with the
    default id_mode="hash" (xxhash64 ids near ±2^63) must raise a clear
    ValueError from the dense-vertex rule — never attempt a ~10^18-row
    spark.range or hit the ANSI max_id+1 overflow."""
    from parallel_pagerank_spark.config import PageRankConfig
    from parallel_pagerank_spark.operators.components import (
        connected_components,
    )
    from parallel_pagerank_spark.operators.pagerank import pagerank

    edges = derive_edges(transcripts, id_mode="hash")
    with pytest.raises(ValueError, match="id_mode"):
        pagerank(edges, config=PageRankConfig(max_iter=2))
    with pytest.raises(ValueError, match="id_mode"):
        connected_components(edges, max_iter=2)
    # an explicit vertices= DataFrame opts out of the dense rule and works
    from parallel_pagerank_spark.operators.derive import turn_vertices

    verts = turn_vertices(transcripts, id_mode="hash").select("id")
    res = pagerank(
        edges, vertices=verts, config=PageRankConfig(tol=0.0, max_iter=2)
    )
    assert res.iterations == 2
