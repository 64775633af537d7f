"""Round-3 operators — bounded weighted SSSP, reciprocity, degree
assortativity, component-size distribution, term stats, and the
events-table analytics — each against an independent pure-Python/NumPy
oracle."""

from __future__ import annotations

import datetime

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import edges_df

DIAMOND = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 0), (1, 2)]
CHAIN = [(i, i + 1) for i in range(8)]


def _wedges_df(spark, edges):
    return spark.createDataFrame(
        [(int(s), int(t), float(w)) for s, t, w in edges],
        "src long, dst long, w double",
    )


def _sssp_python(wedges, sources, rounds):
    """Dense Bellman-Ford, exactly `rounds` relaxation sweeps."""
    dist = {s: 0.0 for s in sources}
    for _ in range(rounds):
        nxt = dict(dist)
        for s, t, w in wedges:
            if s in dist and dist[s] + w < nxt.get(t, float("inf")):
                nxt[t] = dist[s] + w
        dist = nxt
    return dist


WEIGHTED = [
    (0, 1, 4.0),
    (0, 2, 1.0),
    (2, 1, 1.0),  # 0→2→1 (2.0) beats 0→1 (4.0): needs a re-improvement
    (1, 3, 1.0),
    (3, 4, 2.0),
    (2, 4, 9.0),
]


@pytest.mark.parametrize(
    "sources,rounds",
    [([0], 8), ([0], 2), ([0, 4], 8)],  # rounds=2: bounded-prefix check
)
def test_sssp_vs_python(spark, sources, rounds):
    from parallel_pagerank_spark.operators.paths import sssp_distances

    src_df = spark.createDataFrame([(s,) for s in sources], "id long")
    res = sssp_distances(
        _wedges_df(spark, WEIGHTED), src_df, weight_col="w",
        max_rounds=rounds,
    )
    got = {r["id"]: r["dist"] for r in res.distances.collect()}
    assert got == _sssp_python(WEIGHTED, sources, rounds)


def test_sssp_unit_weights_matches_bfs(spark):
    from parallel_pagerank_spark.operators.bfs import bfs_distances
    from parallel_pagerank_spark.operators.paths import sssp_distances

    src_df = spark.createDataFrame([(0,)], "id long")
    e = edges_df(spark, DIAMOND)
    s = sssp_distances(e, src_df, max_rounds=8)
    b = bfs_distances(e, src_df, max_hops=8)
    got_s = {r["id"]: r["dist"] for r in s.distances.collect()}
    got_b = {r["id"]: float(r["dist"]) for r in b.distances.collect()}
    assert got_s == got_b
    assert s.converged


def test_sssp_rejects_negative_weights(spark):
    from parallel_pagerank_spark.operators.paths import sssp_distances

    src_df = spark.createDataFrame([(0,)], "id long")
    with pytest.raises(ValueError, match="non-negative"):
        sssp_distances(
            _wedges_df(spark, [(0, 1, -1.0)]), src_df, weight_col="w"
        )


def test_sssp_converged_flag(spark):
    from parallel_pagerank_spark.operators.paths import sssp_distances

    src_df = spark.createDataFrame([(0,)], "id long")
    cut = sssp_distances(
        edges_df(spark, CHAIN), src_df, max_rounds=3
    )
    assert not cut.converged and cut.supersteps == 3
    full = sssp_distances(edges_df(spark, CHAIN), src_df, max_rounds=20)
    assert full.converged


def test_reciprocity(spark):
    from parallel_pagerank_spark.operators.stats import reciprocity

    # 0↔1 reciprocal, 1→2 not, 3→3 self-loop (own reverse), 0→1 dup
    edges = [(0, 1), (1, 0), (1, 2), (3, 3), (0, 1)]
    row = reciprocity(edges_df(spark, edges)).first()
    assert row["n_edges"] == 4  # distinct
    assert row["n_reciprocal"] == 3  # 0→1, 1→0, 3→3
    assert row["reciprocity"] == pytest.approx(3 / 4)


def test_degree_assortativity(spark):
    from parallel_pagerank_spark.operators.stats import degree_assortativity

    edges = DIAMOND + [(3, 1)]
    row = degree_assortativity(edges_df(spark, edges)).first()
    out_deg: dict[int, int] = {}
    in_deg: dict[int, int] = {}
    for s, t in edges:
        out_deg[s] = out_deg.get(s, 0) + 1
        in_deg[t] = in_deg.get(t, 0) + 1
    xs = [out_deg[s] for s, _ in edges]
    ys = [in_deg[t] for _, t in edges]
    assert row["n_edges"] == len(edges)
    assert row["assortativity"] == pytest.approx(
        float(np.corrcoef(xs, ys)[0, 1])
    )


def test_degree_assortativity_null_on_zero_variance(spark):
    from parallel_pagerank_spark.operators.stats import degree_assortativity

    row = degree_assortativity(edges_df(spark, [(0, 1)])).first()
    assert row["assortativity"] is None


def test_component_size_distribution(spark):
    from parallel_pagerank_spark.operators.components import (
        large_star_small_star,
    )
    from parallel_pagerank_spark.operators.stats import (
        component_size_distribution,
    )

    # components {0..3}, {4,5}, {6,7} under dense-id rule (+ no isolated:
    # max id participates)
    edges = [(0, 1), (1, 2), (2, 3), (4, 5), (6, 7)]
    res = large_star_small_star(edges_df(spark, edges))
    rows = {
        r["size"]: r["n_components"]
        for r in component_size_distribution(res.components).collect()
    }
    assert rows == {4: 1, 2: 2}


def _events_frame(spark):
    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)

    def ts(sec):
        return t0 + datetime.timedelta(seconds=sec)

    rows = [
        (1, ts(0), "u1", "search", 1.0),
        (2, ts(10), "u1", "search", 2.0),
        (3, ts(20), "u1", "fetch", 3.0),
        (4, ts(5), "u2", "search", 5.0),
        (5, ts(60), "u2", "fetch", None),
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id string, "
        "event_type string, value double",
    )


def test_tool_stats(spark):
    from parallel_pagerank_spark.sources.events import tool_stats

    rows = {r["event_type"]: r for r in tool_stats(_events_frame(spark)).collect()}
    s = rows["search"]
    assert s["n_events"] == 3 and s["n_users"] == 2
    assert s["mean_value"] == pytest.approx((1.0 + 2.0 + 5.0) / 3)
    assert s["last_us"] - s["first_us"] == 10_000_000
    f = rows["fetch"]
    assert f["n_events"] == 2
    assert f["mean_value"] == pytest.approx(3.0)  # NULL excluded from avg


def test_conversation_stats(spark):
    from parallel_pagerank_spark.sources.events import conversation_stats

    rows = {
        r["user_id"]: r
        for r in conversation_stats(_events_frame(spark)).collect()
    }
    u1 = rows["u1"]
    assert u1["n_events"] == 3 and u1["n_event_types"] == 2
    assert u1["duration_us"] == 20_000_000
    assert rows["u2"]["duration_us"] == 55_000_000


def test_term_stats(spark):
    from parallel_pagerank_spark.functions.text import term_stats

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the THE dog"), (3, None)],
        "doc_id long, text string",
    )
    rows = {r["term"]: r for r in term_stats(docs).collect()}
    assert rows["the"]["df"] == 2 and rows["the"]["total_tf"] == 3
    assert rows["cat"]["df"] == 1 and rows["cat"]["total_tf"] == 1
    assert set(rows) == {"the", "cat", "sat", "dog"}
