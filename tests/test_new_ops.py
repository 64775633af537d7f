"""HITS, bounded BFS, TF-IDF, dedup-mapping, and centroid operators —
each against an independent pure-Python/NumPy oracle."""

from __future__ import annotations

import math
from collections import deque

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import edges_df

DIAMOND = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 0), (1, 2)]
CHAIN = [(i, i + 1) for i in range(8)]
MULTI = [(0, 1), (0, 1), (1, 2), (2, 0), (3, 1)]  # multi-edge + extra src


def _hits_numpy(edges, n, iters):
    """Dense mirror of operators/hits.py: sparse uniform start over
    distinct sources, L1 normalization per half-step."""
    src = np.array([e[0] for e in edges])
    dst = np.array([e[1] for e in edges])
    hub = np.zeros(n)
    sources = np.unique(src)
    hub[sources] = 1.0 / len(sources)
    auth = np.zeros(n)
    for _ in range(iters):
        auth = np.zeros(n)
        np.add.at(auth, dst, hub[src])
        auth /= auth.sum() or 1.0
        hub = np.zeros(n)
        np.add.at(hub, src, auth[dst])
        hub /= hub.sum() or 1.0
    return hub, auth


@pytest.mark.parametrize("edges,n", [(DIAMOND, 4), (CHAIN, 9), (MULTI, 4)])
def test_hits_vs_numpy(spark, edges, n):
    from parallel_pagerank_spark.operators.hits import hits

    res = hits(edges_df(spark, edges), max_iter=10)
    hub_exp, auth_exp = _hits_numpy(edges, n, 10)
    rows = {r["id"]: r for r in res.scores.collect()}
    assert set(rows) == set(range(n))
    for i in range(n):
        assert rows[i]["hub"] == pytest.approx(hub_exp[i], abs=1e-12)
        assert rows[i]["authority"] == pytest.approx(auth_exp[i], abs=1e-12)
    assert res.iterations == 10
    # L1 invariant: both score vectors sum to 1 after any full round
    assert sum(r["hub"] for r in rows.values()) == pytest.approx(1.0)
    assert sum(r["authority"] for r in rows.values()) == pytest.approx(1.0)


def test_hits_zero_scores_for_sinks_and_sources(spark):
    from parallel_pagerank_spark.operators.hits import hits

    # 0 -> 1: vertex 0 has no in-edges (authority 0), vertex 1 no
    # out-edges (hub 0)
    res = hits(edges_df(spark, [(0, 1)]), max_iter=3)
    rows = {r["id"]: r for r in res.scores.collect()}
    assert rows[0]["authority"] == 0.0
    assert rows[1]["hub"] == 0.0
    assert rows[0]["hub"] == 1.0
    assert rows[1]["authority"] == 1.0


def _bfs_python(edges, sources, max_hops, directed):
    adj: dict[int, list[int]] = {}
    for s, t in edges:
        adj.setdefault(s, []).append(t)
        if not directed:
            adj.setdefault(t, []).append(s)
    dist = {s: 0 for s in sources}
    q = deque(sources)
    while q:
        u = q.popleft()
        if dist[u] >= max_hops:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


@pytest.mark.parametrize("directed", [True, False])
@pytest.mark.parametrize(
    "edges,sources,hops",
    [
        (DIAMOND, [0], 8),
        (CHAIN, [0], 3),  # bounded: vertices 4..8 unreached
        (CHAIN, [0, 5], 8),
        (MULTI, [3], 8),
    ],
)
def test_bfs_vs_python(spark, edges, sources, hops, directed):
    from parallel_pagerank_spark.operators.bfs import bfs_distances

    src_df = spark.createDataFrame([(s,) for s in sources], "id long")
    res = bfs_distances(
        edges_df(spark, edges), src_df, max_hops=hops, directed=directed
    )
    got = {r["id"]: r["dist"] for r in res.distances.collect()}
    assert got == _bfs_python(edges, sources, hops, directed)


def test_bfs_converged_flag(spark):
    from parallel_pagerank_spark.operators.bfs import bfs_distances

    src = spark.createDataFrame([(0,)], "id long")
    full = bfs_distances(edges_df(spark, CHAIN), src, max_hops=20)
    assert full.converged and full.supersteps <= 9
    cut = bfs_distances(edges_df(spark, CHAIN), src, max_hops=3)
    assert not cut.converged and cut.supersteps == 3


def test_tf_idf(spark):
    from parallel_pagerank_spark.functions.text import tf_idf

    docs = spark.createDataFrame(
        [
            (1, "the cat sat"),
            (2, "the cat  THE cat"),  # normalization collapses/lowers
            (3, "dog"),
            (4, None),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_id"], r["term"]): r for r in tf_idf(docs).collect()
    }
    n = 5
    def idf(df):
        return math.log((1.0 + n) / (1.0 + df)) + 1.0

    assert rows[(2, "cat")]["tf"] == 2
    assert rows[(2, "cat")]["tfidf"] == pytest.approx(2 * idf(2))
    assert rows[(1, "sat")]["tfidf"] == pytest.approx(idf(1))
    assert rows[(3, "dog")]["tfidf"] == pytest.approx(idf(1))
    # "the" appears in docs 1 and 2 → df = 2
    assert rows[(1, "the")]["tfidf"] == pytest.approx(idf(2))
    # null/empty docs contribute no rows
    assert not any(d in (4, 5) for d, _ in rows)


def test_exact_dedup_mapping(spark):
    from parallel_pagerank_spark.functions.dedup import exact_dedup_mapping

    docs = spark.createDataFrame(
        [
            (10, "Hello  world"),
            (11, "hello world"),  # same normalized content as 10
            (12, "other"),
            (13, "HELLO WORLD\n"),  # same again
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["keep_id"] for r in exact_dedup_mapping(docs).collect()
    }
    assert got == {10: 10, 11: 10, 12: 12, 13: 10}


def test_embedding_centroids(spark):
    from parallel_pagerank_spark.functions.similarity import (
        embedding_centroids,
    )

    emb = spark.createDataFrame(
        [
            (1, [1.0, 2.0], 0),
            (2, [3.0, 4.0], 0),
            (3, [10.0, 20.0], 1),
            (4, None, 1),  # null vector: contributes nothing
        ],
        "vec_id long, embedding array<float>, label int",
    )
    rows = {
        (r["group"], r["pos"]): r
        for r in embedding_centroids(emb).collect()
    }
    assert rows[(0, 0)]["centroid_val"] == pytest.approx(2.0)
    assert rows[(0, 1)]["centroid_val"] == pytest.approx(3.0)
    assert rows[(1, 0)]["centroid_val"] == pytest.approx(10.0)
    assert rows[(0, 0)]["n_vectors"] == 2
    assert rows[(1, 0)]["n_vectors"] == 1
    assert len(rows) == 4
