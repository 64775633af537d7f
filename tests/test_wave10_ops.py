"""Wave-10: n-gram containment, deterministic-Luby MIS, quotient graph."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import edges_df

_P = 2_147_483_647
_K = 2_654_435_761
_M = 4_294_967_296


def _bucket(i: int, salt: int = 0) -> int:
    return (i + salt) % _P * _K % _M


# --------------------------------------------------- n-gram containment
def _ngrams_py(text: str, n: int) -> set[str]:
    toks = text.lower().split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_ngram_containment_vs_python(spark):
    from parallel_pagerank_spark.functions.decontam import (
        ngram_containment,
    )

    n = 3
    train_rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "pack my box with five dozen liquor jugs"),
    ]
    test_rows = [
        (10, "the quick brown fox sleeps"),  # partial overlap
        (11, "pack my box with five dozen liquor jugs"),  # full copy
        (12, "completely novel evaluation sentence here"),  # clean
        (13, "a b"),  # too short
    ]
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    test = spark.createDataFrame(test_rows, "doc_id long, text string")
    train_g = set().union(*(_ngrams_py(t, n) for _, t in train_rows))
    for key in ("text", "hash64"):
        got = {
            r["doc_id"]: (r["n_grams"], r["n_hit"], r["containment"])
            for r in ngram_containment(train, test, n=n, key=key).collect()
        }
        assert set(got) == {10, 11, 12, 13}
        for i, t in test_rows:
            g = _ngrams_py(t, n)
            hit = len(g & train_g)
            want = (len(g), hit, hit / len(g) if g else 0.0)
            assert got[i] == want, (key, i)
        assert got[11][2] == 1.0  # exact copy is fully contained
        assert got[12][1] == 0
        assert got[13] == (0, 0, 0.0)


def test_ngram_containment_validates(spark):
    from parallel_pagerank_spark.functions.decontam import (
        ngram_containment,
    )

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        ngram_containment(df, df, n=0)
    with pytest.raises(ValueError):
        ngram_containment(df, df, key="crc")


# ------------------------------------------------- maximal independent set
def _mis_py(edges, salt=0, max_iter=64):
    """Sequential replay of the same deterministic Luby rounds."""
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    active = set(adj)
    members = set()
    r = 0
    while active and r < max_iter:
        r += 1
        pri = {v: (_bucket(v, salt + r), v) for v in active}
        winners = {
            v
            for v in active
            if all(
                pri[v] < pri[u] for u in adj[v] if u in active
            )
        }
        retired = set(winners)
        for w in winners:
            retired |= adj[w] & active
        members |= winners
        active -= retired
    return members, r


GRAPHS = [
    [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)],  # 5-ring
    [(0, i) for i in range(1, 12)],  # star
    [(i, j) for i in range(6) for j in range(i + 1, 6)],  # K6
    [(i, i + 1) for i in range(20)]
    + [(i, i + 2) for i in range(0, 18, 3)],  # chain + chords
]


@pytest.mark.parametrize("edges", GRAPHS)
def test_mis_vs_python_and_properties(spark, edges):
    from parallel_pagerank_spark.operators.mis import (
        maximal_independent_set,
    )

    df = edges_df(spark, edges)
    res = maximal_independent_set(df)
    assert res.converged
    got = {r["id"] for r in res.members.collect()}
    want, rounds = _mis_py(edges)
    assert got == want
    assert res.rounds == rounds
    # independence
    adj = {(u, v) for u, v in edges} | {(v, u) for u, v in edges}
    for u in got:
        for v in got:
            assert u == v or (u, v) not in adj
    # maximality: every non-member edge endpoint has a member neighbor
    nodes = {u for e in edges for u in e}
    for v in nodes - got:
        assert any(
            (v, u) in adj for u in got
        ), f"{v} has no member neighbor"


def test_mis_direction_multiplicity_selfloop_invariant(spark):
    from parallel_pagerank_spark.operators.mis import (
        maximal_independent_set,
    )

    base = [(0, 1), (1, 2), (2, 3)]
    noisy = base + [(1, 0), (0, 1), (2, 2), (3, 2)]
    a = {
        r["id"]
        for r in maximal_independent_set(edges_df(spark, base))
        .members.collect()
    }
    b = {
        r["id"]
        for r in maximal_independent_set(edges_df(spark, noisy))
        .members.collect()
    }
    assert a == b


def test_mis_salt_redeal_still_valid(spark):
    from parallel_pagerank_spark.operators.mis import (
        maximal_independent_set,
    )

    edges = GRAPHS[3]
    df = edges_df(spark, edges)
    got = {
        r["id"]
        for r in maximal_independent_set(df, salt=99).members.collect()
    }
    want, _ = _mis_py(edges, salt=99)
    assert got == want


# ----------------------------------------------------------- quotient graph
def test_quotient_graph_vs_hand(spark):
    from parallel_pagerank_spark.operators.scc import quotient_graph

    # two communities {0,1,2} and {10,11}: 3 intra-A, 1 intra-B, 2 A→B
    edges = [(0, 1), (1, 2), (2, 0), (10, 11), (1, 10), (2, 11), (0, 1)]
    df = edges_df(spark, edges)
    labels = spark.createDataFrame(
        [(0, 100), (1, 100), (2, 100), (10, 200), (11, 200)],
        "id long, label long",
    )
    got = {
        (r["src_label"], r["dst_label"]): r["n_links"]
        for r in quotient_graph(df, labels).collect()
    }
    # duplicate (0,1) edge counts twice — multigraph semantics
    assert got == {(100, 100): 4, (200, 200): 1, (100, 200): 2}
    cross = {
        (r["src_label"], r["dst_label"]): r["n_links"]
        for r in quotient_graph(df, labels, keep_intra=False).collect()
    }
    assert cross == {(100, 200): 2}


def test_quotient_graph_matches_condensation_on_scc(spark):
    from parallel_pagerank_spark.operators.scc import (
        condensation_edges,
        quotient_graph,
        strongly_connected_components,
    )

    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 3), (2, 3), (4, 5)]
    df = edges_df(spark, edges)
    scc = strongly_connected_components(df).components
    a = {
        (r["src_label"], r["dst_label"]): r["n_links"]
        for r in quotient_graph(
            df, scc, label_col="scc", keep_intra=False
        ).collect()
    }
    b = {
        (r["src_scc"], r["dst_scc"]): r["n_links"]
        for r in condensation_edges(df, scc).collect()
    }
    assert a == b
