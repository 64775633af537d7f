"""Wave-18 operators: as-of join, incremental connected components,
hot-key skew diagnostics."""

from __future__ import annotations

import datetime as dt

import pytest

from tests.conftest import edges_df


def _ts(s: int):
    return dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture()
def quotes_trades(spark):
    # right side: quotes per symbol key
    quotes = spark.createDataFrame(
        [
            ("A", _ts(0), 100),
            ("A", _ts(10), 110),
            ("A", _ts(20), 120),
            ("B", _ts(5), 500),
        ],
        "sym string, ts timestamp, px long",
    )
    trades = spark.createDataFrame(
        [
            (1, "A", _ts(4)),   # -> px 100 (ts 0)
            (2, "A", _ts(10)),  # inclusive -> px 110; strict -> px 100
            (3, "A", _ts(25)),  # -> px 120
            (4, "B", _ts(4)),   # before any quote -> null
            (5, "B", _ts(6)),   # -> px 500
            (6, "C", _ts(9)),   # key with no quotes -> null
        ],
        "trade_id long, sym string, ts timestamp",
    )
    return quotes, trades


def test_asof_join_backward_inclusive(spark, quotes_trades):
    from parallel_pagerank_spark.functions.asof import asof_join

    quotes, trades = quotes_trades
    rows = {
        r["trade_id"]: r for r in asof_join(trades, quotes, on="sym").collect()
    }
    assert rows[1]["r_px"] == 100 and rows[1]["gap_us"] == 4_000_000
    assert rows[2]["r_px"] == 110 and rows[2]["gap_us"] == 0
    assert rows[3]["r_px"] == 120 and rows[3]["gap_us"] == 5_000_000
    assert rows[4]["r_px"] is None and rows[4]["gap_us"] is None
    assert rows[5]["r_px"] == 500
    assert rows[6]["r_px"] is None
    # left columns preserved, one output row per left row
    assert len(rows) == 6
    assert set(trades.columns) <= set(
        asof_join(trades, quotes, on="sym").columns
    )


def test_asof_join_strict(spark, quotes_trades):
    from parallel_pagerank_spark.functions.asof import asof_join

    quotes, trades = quotes_trades
    rows = {
        r["trade_id"]: r
        for r in asof_join(trades, quotes, on="sym", strict=True).collect()
    }
    assert rows[2]["r_px"] == 100, "equal ts excluded under strict"
    assert rows[1]["r_px"] == 100 and rows[3]["r_px"] == 120


def test_asof_join_tolerance(spark, quotes_trades):
    from parallel_pagerank_spark.functions.asof import asof_join

    quotes, trades = quotes_trades
    rows = {
        r["trade_id"]: r
        for r in asof_join(
            trades, quotes, on="sym", tolerance_us=4_500_000
        ).collect()
    }
    assert rows[1]["r_px"] == 100  # gap 4s <= 4.5s
    assert rows[3]["r_px"] is None  # gap 5s > 4.5s voided
    assert rows[3]["gap_us"] is None


def test_asof_join_tie_col(spark):
    from parallel_pagerank_spark.functions.asof import asof_join

    right = spark.createDataFrame(
        [(1, _ts(0), 7), (1, _ts(0), 9)], "k long, ts timestamp, rid long"
    )
    left = spark.createDataFrame([(1, _ts(1))], "k long, ts timestamp")
    got = asof_join(left, right, on="k", tie_col="rid").collect()[0]
    assert got["r_rid"] == 9, "largest tie_col wins among equal-ts rows"


def test_asof_join_validation(spark, quotes_trades):
    from parallel_pagerank_spark.functions.asof import asof_join

    quotes, trades = quotes_trades
    with pytest.raises(ValueError):
        asof_join(trades, quotes, on="nope")
    with pytest.raises(ValueError):
        asof_join(trades, quotes, on="sym", tolerance_us=-1)
    with pytest.raises(ValueError):
        asof_join(trades, quotes, on="sym", tie_col="missing")


def test_asof_join_plan_single_shuffle_no_python(spark, quotes_trades):
    from parallel_pagerank_spark.functions.asof import asof_join

    quotes, trades = quotes_trades
    plan = (
        asof_join(trades, quotes, on="sym")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "PythonUDF" not in plan and "ArrowEval" not in plan


CC_EDGES = [
    (0, 1), (1, 2), (3, 4), (5, 6), (6, 7), (8, 9),
    (2, 3),   # new batch will merge {0..2} with {3,4}
    (7, 8),   # and {5..7} with {8,9}
    (10, 10),
]


def test_cc_incremental_matches_full(spark):
    from parallel_pagerank_spark.operators.components import (
        connected_components,
        connected_components_incremental,
    )

    old = edges_df(spark, CC_EDGES[:6])
    new = edges_df(spark, CC_EDGES[6:])
    full = {
        r["id"]: r["component"]
        for r in connected_components(
            edges_df(spark, CC_EDGES)
        ).components.collect()
    }
    prev = connected_components(old).components
    inc = connected_components_incremental(prev, new)
    got = {r["id"]: r["component"] for r in inc.components.collect()}
    assert got == full
    assert inc.converged


def test_cc_incremental_forced_distributed(spark):
    from parallel_pagerank_spark.operators.components import (
        connected_components,
        connected_components_incremental,
    )

    old = edges_df(spark, CC_EDGES[:6])
    new = edges_df(spark, CC_EDGES[6:])
    prev = connected_components(old, fast_path_edges=0).components
    inc = connected_components_incremental(prev, new, fast_path_edges=0)
    full = {
        r["id"]: r["component"]
        for r in connected_components(
            edges_df(spark, CC_EDGES), fast_path_edges=0
        ).components.collect()
    }
    assert {r["id"]: r["component"] for r in inc.components.collect()} == full


def test_hot_keys(spark):
    from parallel_pagerank_spark.functions.profile import hot_keys

    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 3 + [(None,)] * 2 + [("d",)],
        "k string",
    )
    rows = hot_keys(df, "k", k=3).collect()
    assert [(r["k"], r["n"]) for r in rows] == [("a", 5), ("b", 3), ("c", 3)]
    assert rows[0]["share"] == round(5 / 14, 9)
    # null keys count; tie at the cut breaks by smallest key
    all_rows = hot_keys(df, "k", k=10).collect()
    assert {r["k"]: r["n"] for r in all_rows}[None] == 2
    with pytest.raises(ValueError):
        hot_keys(df, "k", k=0)


def test_hot_keys_plan_topk(spark):
    from parallel_pagerank_spark.functions.profile import hot_keys

    df = spark.range(100).selectExpr("id % 7 AS k")
    plan = (
        hot_keys(df, "k", k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, "top-k must not plan a full sort"
