"""Katz centrality, landmark BFS / harmonic centrality, exact Jaccard
similarity join, near-dup clustering, and repetition signals — each
against an independent pure-Python/NumPy oracle."""

from __future__ import annotations

from collections import Counter, deque

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import edges_df

DIAMOND = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 0), (1, 2)]
CHAIN = [(i, i + 1) for i in range(8)]
MULTI = [(0, 1), (0, 1), (1, 2), (2, 0), (3, 1)]


# ---------------------------------------------------------------- Katz
def _katz_numpy(edges, n, alpha, beta, iters):
    x = np.full(n, beta)
    for _ in range(iters):
        nxt = np.full(n, beta)
        for s, d in edges:  # parallel edges contribute multiply
            nxt[d] += alpha * x[s]
        x = nxt
    return x


@pytest.mark.parametrize("edges,n", [(DIAMOND, 4), (CHAIN, 9), (MULTI, 4)])
def test_katz_vs_numpy(spark, edges, n):
    from parallel_pagerank_spark.operators.katz import katz_centrality

    res = katz_centrality(
        edges_df(spark, edges), alpha=0.1, beta=1.0, max_iter=12
    )
    exp = _katz_numpy(edges, n, 0.1, 1.0, 12)
    rows = {r["id"]: r["katz"] for r in res.scores.collect()}
    assert set(rows) == set(range(n))
    for i in range(n):
        assert rows[i] == pytest.approx(exp[i], rel=1e-12)
    assert res.iterations == 12


def test_katz_empty_graph(spark):
    from parallel_pagerank_spark.operators.katz import katz_centrality

    empty = edges_df(spark, []).limit(0)
    verts = empty.sparkSession.range(3).select(F.col("id"))
    res = katz_centrality(empty, vertices=verts, max_iter=5)
    assert {r["katz"] for r in res.scores.collect()} == {1.0}
    assert res.iterations == 0


# ----------------------------------------------------- landmark BFS
def _bfs_py(edges, source):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    dist = {source: 0}
    q = deque([source])
    while q:
        u = q.popleft()
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


@pytest.mark.parametrize("edges", [DIAMOND, CHAIN, MULTI])
def test_landmark_distances_vs_python(spark, edges):
    from parallel_pagerank_spark.operators.bfs import landmark_distances

    landmarks = [0, 2]
    lm = spark.createDataFrame([(i,) for i in landmarks], "id long")
    res = landmark_distances(edges_df(spark, edges), lm, max_hops=4)
    got = {
        (r["id"], r["landmark"]): r["dist"] for r in res.distances.collect()
    }
    exp = {}
    for l in landmarks:
        for v, d in _bfs_py(edges, l).items():
            if d <= 4:
                exp[(v, l)] = d
    assert got == exp


def test_landmark_bound_truncates(spark):
    from parallel_pagerank_spark.operators.bfs import landmark_distances

    lm = spark.createDataFrame([(0,)], "id long")
    res = landmark_distances(edges_df(spark, CHAIN), lm, max_hops=3)
    got = {r["id"]: r["dist"] for r in res.distances.collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}
    assert not res.converged  # frontier still live at the bound


def test_harmonic_centrality(spark):
    from parallel_pagerank_spark.operators.bfs import (
        harmonic_centrality,
        landmark_distances,
    )

    lm = spark.createDataFrame([(0,)], "id long")
    res = landmark_distances(edges_df(spark, CHAIN), lm, max_hops=8)
    h = harmonic_centrality(res).collect()
    assert len(h) == 1
    exp = sum(1.0 / d for d in range(1, 9))
    assert h[0]["harmonic"] == pytest.approx(exp, rel=1e-12)
    assert h[0]["n_reached"] == 8


# ------------------------------------------- exact Jaccard similarity
def _shingles(text, n=5):
    t = " ".join(text.lower().split())
    if len(t) <= n:
        return {t[:n]}
    return {t[i : i + n] for i in range(len(t) - n + 1)}


def _jaccard_pairs_py(docs, threshold, n=5):
    out = {}
    ids = sorted(docs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = _shingles(docs[a], n), _shingles(docs[b], n)
            j = len(sa & sb) / len(sa | sb)
            if j >= threshold:
                out[(a, b)] = j
    return out


DOCS = {
    0: "the quick brown fox jumps over the lazy dog",
    1: "the quick brown fox jumps over the lazy cat",  # near-dup of 0
    2: "the quick brown fox jumps over the lazy dog",  # exact dup of 0
    3: "completely different content about spark engines",
    4: "completely different content about spark planes",  # near-dup of 3
    5: "short",
    6: "the the the the the the the the",  # degenerate repetition
}


def _docs_df(spark, docs=DOCS):
    return spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "doc_id long, text string"
    )


@pytest.mark.parametrize("threshold", [0.5, 0.8, 0.95])
def test_jaccard_join_vs_bruteforce(spark, threshold):
    from parallel_pagerank_spark.functions.dedup import (
        jaccard_similarity_join,
    )

    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_similarity_join(
            _docs_df(spark), threshold=threshold
        ).collect()
    }
    exp = _jaccard_pairs_py(DOCS, threshold)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], rel=1e-12)


def test_jaccard_join_hot_shingle_lossless(spark):
    """Every doc shares the hot prefix 'common header: ' — the prefix
    filter must still find exactly the true >= t pairs (losslessness),
    and the hot shingles must not produce spurious ones."""
    from parallel_pagerank_spark.functions.dedup import (
        jaccard_similarity_join,
    )

    docs = {i: f"common header: payload number {i}" for i in range(20)}
    docs[100] = docs[0].replace("number 0", "number 0!")  # near-dup
    got = {
        (r["id_a"], r["id_b"])
        for r in jaccard_similarity_join(
            _docs_df(spark, docs), threshold=0.8
        ).collect()
    }
    exp = set(_jaccard_pairs_py(docs, 0.8))
    assert got == exp
    assert (0, 100) in got


def test_jaccard_join_threshold_validation(spark):
    from parallel_pagerank_spark.functions.dedup import (
        jaccard_similarity_join,
    )

    with pytest.raises(ValueError):
        jaccard_similarity_join(_docs_df(spark), threshold=0.0)


def test_near_dup_clusters_transitive(spark):
    """A~B and B~C must land in ONE cluster even if A~C is below
    threshold (the transitive-closure property pairs alone lack)."""
    from parallel_pagerank_spark.functions.dedup import near_dup_clusters

    base = "shared boilerplate text that dominates the shingle set ok"
    docs = {
        10: base + " alpha",
        11: base + " alphq",  # ~10
        12: base + " alpzq",  # ~11, farther from 10
        50: "completely unrelated island document",
    }
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in near_dup_clusters(
            _docs_df(spark, docs), threshold=0.9
        ).collect()
    }
    # islands (no pair) are absent; the chain collapses to min id 10
    assert 50 not in out
    assert set(out.values()) == {10}
    assert set(out) >= {10, 11, 12}


# ------------------------------------------------- repetition signals
def test_repetition_signals_hand_oracle(spark):
    from parallel_pagerank_spark.functions.text import repetition_signals

    rows = {
        r["doc_id"]: r
        for r in repetition_signals(_docs_df(spark)).collect()
    }
    # doc 6: 8x 'the' — maximal repetition
    r6 = rows[6]
    assert r6["n_words"] == 8 and r6["n_distinct_words"] == 1
    assert r6["dup_word_frac"] == pytest.approx(7 / 8)
    assert r6["top_word_frac"] == pytest.approx(1.0)
    assert r6["top_bigram_frac"] == pytest.approx(1.0)
    # doc 5: single word — no bigram slots
    r5 = rows[5]
    assert r5["n_words"] == 1 and r5["top_bigram_frac"] == 0.0
    # doc 0: 'the' twice in 9 words; every bigram unique
    r0 = rows[0]
    assert r0["n_words"] == 9 and r0["n_distinct_words"] == 8
    assert r0["top_word_frac"] == pytest.approx(2 / 9)
    assert r0["top_bigram_frac"] == pytest.approx(1 / 8)


def test_repetition_signals_vs_counter(spark):
    from parallel_pagerank_spark.functions.text import repetition_signals

    rows = {
        r["doc_id"]: r
        for r in repetition_signals(_docs_df(spark)).collect()
    }
    for did, text in DOCS.items():
        words = text.lower().split()
        wc = Counter(words)
        bg = Counter(zip(words, words[1:]))
        r = rows[did]
        assert r["n_words"] == len(words)
        assert r["n_distinct_words"] == len(wc)
        assert r["top_word_frac"] == pytest.approx(
            max(wc.values()) / len(words)
        )
        if len(words) >= 2:
            assert r["top_bigram_frac"] == pytest.approx(
                max(bg.values()) / (len(words) - 1)
            )
