"""Property-based tests (hypothesis): engine operators vs brute-force
Python on randomized inputs. Few examples per property (Spark round-trips
are ~seconds), but each randomized over structure the fixed fixtures can't
cover: ragged conversations, duplicate texts, arbitrary session gaps."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def transcripts(draw):
    n_convs = draw(st.integers(1, 5))
    rows = []
    for c in range(n_convs):
        n_turns = draw(st.integers(1, 6))
        for t in range(n_turns):
            tool = draw(
                st.sampled_from([None, "search", "code"])
            )
            rows.append((f"c{c}", t, "user", f"t{c}-{t}", tool))
    return rows


@given(transcripts())
@settings(**_SETTINGS)
def test_reply_edges_match_bruteforce(spark, rows):
    """Reply links == consecutive-turn pairs per conversation, for any
    ragged conversation-length structure."""
    from parallel_pagerank_spark.operators.derive import derive_edges

    tr = spark.createDataFrame(
        [(c, t, r, x, tool, None) for c, t, r, x, tool in rows],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    got = {
        (r["src"], r["dst"])
        for r in derive_edges(
            tr, id_mode="hash", handoff_links=False
        ).collect()
    }
    ids = {
        (r["conv_id"], r["turn_idx"]): r["id"]
        for r in tr.select(
            "conv_id",
            "turn_idx",
            F.xxhash64("conv_id", "turn_idx").alias("id"),
        ).collect()
    }
    by_conv: dict[str, list[int]] = {}
    for c, t, *_ in rows:
        by_conv.setdefault(c, []).append(t)
    want = set()
    for c, turns in by_conv.items():
        for t in sorted(turns)[:-1]:
            want.add((ids[(c, t)], ids[(c, t + 1)]))
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["u1", "u2"]), st.integers(0, 20_000)
        ),
        min_size=1,
        max_size=25,
        unique=True,
    ),
    st.integers(60, 3600),
)
@settings(**_SETTINGS)
def test_sessionize_matches_bruteforce(spark, events, gap):
    """Session indices == brute-force gap splitting for arbitrary
    user/timestamp layouts and gap thresholds."""
    from parallel_pagerank_spark.functions.sessions import sessionize

    base = dt.datetime(2026, 1, 1)
    rows = [
        (i, u, base + dt.timedelta(seconds=s))
        for i, (u, s) in enumerate(events)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id string, ts timestamp"
    )
    got = {
        r["event_id"]: (r["user_id"], r["session_idx"])
        for r in sessionize(ev, gap_seconds=gap).collect()
    }
    want = {}
    by_user: dict[str, list[tuple]] = {}
    for i, u, ts in rows:
        by_user.setdefault(u, []).append((ts, i))
    for u, evs in by_user.items():
        evs.sort()
        idx = 0
        prev = None
        for ts, i in evs:
            if prev is None or (ts - prev).total_seconds() > gap:
                idx += 1
            want[i] = (u, idx)
            prev = ts
    assert got == want


@given(
    st.lists(
        st.text(
            alphabet="ab \t\nC", min_size=0, max_size=12
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_exact_dedup_matches_bruteforce(spark, texts):
    """Dedup groups == python dict grouping by the same normalization,
    including whitespace runs, case, and empty strings."""
    from parallel_pagerank_spark.functions.dedup import exact_dedup

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["keep_id"]: r["dup_count"] for r in exact_dedup(df).collect()
    }
    groups: dict[str, list[int]] = {}
    for i, t in enumerate(texts):
        norm = " ".join(t.strip().lower().split())
        groups.setdefault(norm, []).append(i)
    want = {min(ids): len(ids) for ids in groups.values()}
    assert got == want


_edges_strategy = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)),
    min_size=1,
    max_size=40,
)


@given(_edges_strategy)
@settings(**_SETTINGS)
def test_components_fast_random_graphs(spark, edges):
    """Vectorized CC == union-find oracle on arbitrary random edge lists
    (self-loops, duplicates, isolated id-gaps included)."""
    from parallel_pagerank_spark.operators.components import (
        connected_components,
    )

    from .oracles import connected_components_oracle

    df = spark.createDataFrame(
        [(int(s), int(t)) for s, t in edges], "src long, dst long"
    )
    n = max(max(s, t) for s, t in edges) + 1
    res = connected_components(df)
    assert res.mode == "vectorized"
    got = {r["id"]: r["component"] for r in res.components.collect()}
    assert got == connected_components_oracle(edges, n)


@given(_edges_strategy)
@settings(**_SETTINGS)
def test_label_propagation_fast_random_graphs(spark, edges):
    from parallel_pagerank_spark.operators.labelprop import (
        label_propagation,
    )

    from .oracles import label_propagation_oracle

    df = spark.createDataFrame(
        [(int(s), int(t)) for s, t in edges], "src long, dst long"
    )
    n = max(max(s, t) for s, t in edges) + 1
    res = label_propagation(df, max_iter=5)
    assert res.mode == "vectorized"
    got = {r["id"]: r["label"] for r in res.labels.collect()}
    assert got == label_propagation_oracle(edges, n, max_iter=5)


@given(_edges_strategy)
@settings(**_SETTINGS)
def test_pagerank_numpy_tier_random_graphs(spark, edges):
    """The full-driver numpy PageRank tier matches the reference-semantics
    oracle (ranks AND iteration count) on arbitrary random graphs."""
    import numpy as np

    from parallel_pagerank_spark.config import PageRankConfig
    from parallel_pagerank_spark.operators.pagerank import pagerank

    from .oracles import pagerank_oracle

    df = spark.createDataFrame(
        [(int(s), int(t)) for s, t in edges], "src long, dst long"
    )
    want, want_iters, _ = pagerank_oracle(edges, tol=1e-6)
    res = pagerank(df, config=PageRankConfig(tol=1e-6))
    assert res.mode == "vectorized"
    assert res.iterations == want_iters
    got = {r["id"]: r["rank"] for r in res.ranks.collect()}
    got_vec = np.array([got[i] for i in sorted(got)])
    assert np.allclose(got_vec, want, atol=1e-6)
    assert got_vec.sum() == pytest_approx_one(got_vec)


def pytest_approx_one(vec):
    import pytest as _pytest

    return _pytest.approx(1.0, abs=1e-9)


@given(_edges_strategy)
@settings(**_SETTINGS)
def test_triangle_methods_agree_random_graphs(spark, edges):
    """Both triangle variants == brute-force oracle on random graphs."""
    from parallel_pagerank_spark.operators.triangles import triangle_count

    from .oracles import triangle_count_oracle

    df = spark.createDataFrame(
        [(int(s), int(t)) for s, t in edges], "src long, dst long"
    )
    n = max(max(s, t) for s, t in edges) + 1
    want = triangle_count_oracle(edges, n)
    assert triangle_count(df, "ordered") == want
    assert triangle_count(df, "degree_oriented") == want


@pytest.mark.exhaustive  # default tier: test_pagerank_random_graphs (unweighted) + test_weighted_edges_match_oracle cover both axes
@given(
    _edges_strategy,
    st.lists(st.integers(1, 5), min_size=40, max_size=40),
)
@settings(**{**_SETTINGS, "max_examples": 4})
def test_weighted_pagerank_random_graphs(spark, edges, wpool):
    """Weighted PageRank == the weighted oracle for arbitrary graphs and
    positive integer weights (ranks + iteration count)."""
    import numpy as np

    from parallel_pagerank_spark.config import PageRankConfig
    from parallel_pagerank_spark.operators.pagerank import pagerank

    from .oracles import pagerank_oracle

    weights = [float(wpool[i % len(wpool)]) for i in range(len(edges))]
    want, want_iters, _ = pagerank_oracle(
        edges, tol=1e-6, weights=weights
    )
    df = spark.createDataFrame(
        [
            (int(s), int(t), w)
            for (s, t), w in zip(edges, weights)
        ],
        "src long, dst long, weight double",
    )
    res = pagerank(
        df, config=PageRankConfig(tol=1e-6), weight_col="weight"
    )
    assert res.iterations == want_iters
    got = {r["id"]: r["rank"] for r in res.ranks.collect()}
    got_vec = np.array([got[i] for i in sorted(got)])
    assert np.allclose(got_vec, want, atol=1e-6)
