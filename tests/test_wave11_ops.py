"""Wave-11: fixed-k / per-stratum-k deterministic sampling, funnels."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

_P, _K, _M = 2_147_483_647, 2_654_435_761, 4_294_967_296


def _bucket(i: int, salt: int = 0) -> int:
    return (i + salt) % _P * _K % _M


# ----------------------------------------------------- fixed-k sampling
def test_sample_fixed_k_exact_prefix_deterministic(spark):
    from parallel_pagerank_spark.functions.splits import sample_fixed_k

    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    got = [r["doc_id"] for r in sample_fixed_k(df, 25).collect()]
    assert len(got) == 25
    # oracle: k smallest (bucket, id)
    want = sorted(range(1000), key=lambda i: (_bucket(i), i))[:25]
    assert sorted(got) == sorted(want)
    # prefix property: k+1 sample ⊇ k sample
    bigger = {r["doc_id"] for r in sample_fixed_k(df, 26).collect()}
    assert set(got) <= bigger and len(bigger) == 26
    # deterministic under repartition
    again = {
        r["doc_id"]
        for r in sample_fixed_k(df.repartition(13), 25).collect()
    }
    assert again == set(got)
    # k > n returns everything; validation
    assert sample_fixed_k(df, 2000).count() == 1000
    with pytest.raises(ValueError):
        sample_fixed_k(df, -1)


def test_sample_per_stratum_k(spark):
    from parallel_pagerank_spark.functions.splits import (
        sample_per_stratum_k,
    )

    rows = [(i, "en" if i % 3 else "de") for i in range(300)] + [
        (1000, "zh")  # singleton stratum: min(k, 1) = 1 row
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sample_per_stratum_k(df, "lang", 7)
    got: dict[str, set[int]] = {}
    for r in out.collect():
        got.setdefault(r["lang"], set()).add(r["doc_id"])
    # per-stratum oracle
    for lang in ("en", "de", "zh"):
        members = [i for i, lg in rows if lg == lang]
        want = sorted(members, key=lambda i: (_bucket(i), i))[:7]
        assert got.get(lang, set()) == set(want), lang
    assert len(got["zh"]) == 1
    # schema untouched (helper columns dropped)
    assert out.columns == ["doc_id", "lang"]


# ----------------------------------------------------------- funnels
def _t(m):
    return dt.datetime(2026, 1, 1, 12, m)


def test_funnel_counts_vs_hand(spark):
    from parallel_pagerank_spark.sources.events import funnel_counts

    rows = [
        # user 1: full funnel in order
        (1, _t(0), "view"), (1, _t(1), "click"), (1, _t(2), "purchase"),
        # user 2: clicks before viewing → stops at view
        (2, _t(0), "click"), (2, _t(1), "view"),
        # user 3: view + click only
        (3, _t(0), "view"), (3, _t(5), "click"),
        # user 4: never views
        (4, _t(0), "purchase"),
        # user 5: view and click at the SAME ts → strictly-after fails
        (5, _t(0), "view"), (5, _t(0), "click"),
        # user 6: full funnel, later click witnesses (first click is
        # pre-view, second click counts)
        (6, _t(1), "view"), (6, _t(0), "click"), (6, _t(2), "click"),
        (6, _t(3), "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    out = {
        r["step_idx"]: (r["step"], r["n_users"])
        for r in funnel_counts(ev, ["view", "click", "purchase"]).collect()
    }
    # view: users 1,2,3,5,6 → 5; click-after-view: 1,3,6 → 3;
    # purchase-after-click: 1,6 → 2
    assert out == {1: ("view", 5), 2: ("click", 3), 3: ("purchase", 2)}


def test_funnel_counts_validates_and_monotone(spark):
    from parallel_pagerank_spark.sources.events import funnel_counts

    ev = spark.createDataFrame(
        [(1, _t(0), "view")], "user_id long, ts timestamp, event_type string"
    )
    with pytest.raises(ValueError):
        funnel_counts(ev, [])
    out = funnel_counts(ev, ["view", "click"]).collect()
    ns = [r["n_users"] for r in sorted(out, key=lambda r: r["step_idx"])]
    assert ns == [1, 0]


def test_funnel_counts_is_lazy_single_action(spark):
    """r3 rework: funnel_counts itself must fire ZERO Spark jobs (the
    old shape ran a blocking count + eager localCheckpoint per stage);
    all work happens under the caller's one action."""
    from parallel_pagerank_spark.sources.events import funnel_counts

    ev = spark.createDataFrame(
        [(1, _t(0), "view"), (1, _t(1), "click")],
        "user_id long, ts timestamp, event_type string",
    )
    sc = spark.sparkContext
    group = "funnel-laziness-probe"
    sc.setJobGroup(group, "probe")
    try:
        df = funnel_counts(ev, ["view", "click"])
        assert sc.statusTracker().getJobIdsForGroup(group) == []
        rows = df.collect()
        assert len(sc.statusTracker().getJobIdsForGroup(group)) >= 1
    finally:
        sc.setJobGroup("", "")
    assert {(r["step"], r["n_users"]) for r in rows} == {
        ("view", 1), ("click", 1),
    }


# ------------------------------------------------- boilerplate passages
def test_repeated_passages_vs_hand(spark):
    from parallel_pagerank_spark.functions.text import repeated_passages

    boiler = "subscribe to our newsletter for updates"
    rows = [
        (0, f"Unique alpha text here. {boiler}. more alpha."),
        (1, f"Totally different beta. {boiler}. beta beta."),
        (2, f"{boiler}. gamma content gamma."),
        (3, "no shared passages in this one at all, honestly."),
        (4, f"{boiler}. {boiler}. twice in one doc counts once."),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["passage"]: (r["n_docs"], r["first_doc"])
        for r in repeated_passages(docs, min_docs=3, min_chars=10).collect()
    }
    assert out == {boiler: (4, 0)}
    # threshold respected: nothing else appears in >= 3 docs
    out2 = {
        r["passage"]
        for r in repeated_passages(docs, min_docs=2, min_chars=10).collect()
    }
    assert boiler in out2
    with pytest.raises(ValueError):
        repeated_passages(docs, min_docs=0)
