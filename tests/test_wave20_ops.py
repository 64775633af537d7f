"""Wave-20 operators: tool transition matrix and z-order layout keys."""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import functions as F

from parallel_pagerank_spark.functions.layout import (
    zorder_bucket_sql,
    zorder_key,
    zorder_key_sql,
)
from parallel_pagerank_spark.sources.events import tool_transitions


def _ts(s: int):
    return datetime.datetime(2026, 1, 1) + datetime.timedelta(seconds=s)


@pytest.fixture()
def tiny_events(spark):
    # conv 1: a -> b -> a -> c ; conv 2: b -> b ; conv 3: single event;
    # one NULL-conv event that must be dropped entirely.
    rows = [
        (1, _ts(0), 1, "a"),
        (2, _ts(1), 1, "b"),
        (3, _ts(2), 1, "a"),
        (4, _ts(3), 1, "c"),
        (5, _ts(0), 2, "b"),
        (6, _ts(1), 2, "b"),
        (7, _ts(0), 3, "a"),
        (8, _ts(9), None, "a"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_tool_transitions_hand_counts(spark, tiny_events):
    got = {
        (r.from_tool, r.to_tool): (r.n, r.prob)
        for r in tool_transitions(tiny_events).collect()
    }
    # conv 1 pairs: (a,b), (b,a), (a,c); conv 2: (b,b); conv 3 & NULL: none
    assert got == {
        ("a", "b"): (1, 0.5),
        ("a", "c"): (1, 0.5),
        ("b", "a"): (1, 0.5),
        ("b", "b"): (1, 0.5),
    }


def test_tool_transitions_rows_normalize(spark, tiny_events):
    sums = (
        tool_transitions(tiny_events)
        .groupBy("from_tool")
        .agg(F.sum("prob").alias("s"))
        .collect()
    )
    for r in sums:
        assert r.s == pytest.approx(1.0, abs=1e-12)


def test_tool_transitions_tie_order_stable(spark):
    # same-ts events break by event_id: 10 -> 11 -> 12 gives (x,y), (y,z)
    rows = [
        (12, _ts(0), 1, "z"),
        (10, _ts(0), 1, "x"),
        (11, _ts(0), 1, "y"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        (r.from_tool, r.to_tool): r.n for r in tool_transitions(ev).collect()
    }
    assert got == {("x", "y"): 1, ("y", "z"): 1}


def _zkey_py(vals, los, his, bits):
    nb = 1 << bits
    key = 0
    ncols = len(vals)
    for j, (v, lo, hi) in enumerate(zip(vals, los, his)):
        b = ((v - lo) * nb) // (hi - lo + 1)
        assert 0 <= b < nb
        for i in range(bits):
            key |= ((b >> i) & 1) << (i * ncols + j)
    return key


def test_zorder_python_parity(spark):
    rows = [(i, i * 37 % 101, (i * i) % 997) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = zorder_key(df, ["x", "y"], bits=6).collect()
    xs = [r[1] for r in rows]
    ys = [r[2] for r in rows]
    lox, hix, loy, hiy = min(xs), max(xs), min(ys), max(ys)
    for r in got:
        want = _zkey_py([r.x, r.y], [lox, loy], [hix, hiy], 6)
        assert (r.zb_x, r.zb_y) == (
            ((r.x - lox) * 64) // (hix - lox + 1),
            ((r.y - loy) * 64) // (hiy - loy + 1),
        )
        assert r.zkey == want


def test_zorder_bucket_range_and_constant_column(spark):
    df = spark.createDataFrame(
        [(0, 5), (1, 5), (1023, 5)], "v long, c long"
    )
    out = zorder_key(df, ["v", "c"], bits=8).collect()
    assert all(0 <= r.zb_v <= 255 for r in out)
    # the max value must land in the top bucket, not escape it
    assert max(r.zb_v for r in out) == 255
    # constant column buckets to 0 everywhere -> contributes nothing
    assert all(r.zb_c == 0 for r in out)


def test_zorder_null_yields_null_key(spark):
    df = spark.createDataFrame([(1, 1), (None, 2), (3, 3)], "v long, w long")
    out = {r.w: r.zkey for r in zorder_key(df, ["v", "w"], bits=4).collect()}
    assert out[2] is None
    assert out[1] is not None and out[3] is not None


def test_zorder_repartition_deterministic(spark):
    rows = [(i, i * 7 % 50, i * 13 % 50) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    a = {r.id: r.zkey for r in zorder_key(df, ["x", "y"]).collect()}
    b = {
        r.id: r.zkey
        for r in zorder_key(df.repartition(17), ["x", "y"]).collect()
    }
    assert a == b


def test_zorder_duckdb_mirror(spark):
    duckdb = pytest.importorskip("duckdb")
    rows = [(i, i * 37 % 101, (i * i) % 997) for i in range(150)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {
        r.id: (r.zb_x, r.zb_y, r.zkey)
        for r in zorder_key(df, ["x", "y"], bits=6).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({i},{x},{y})" for i, x, y in rows)
        + ") v(id, x, y)"
    )
    bx = zorder_bucket_sql("x", "(SELECT min(x) FROM t)", "(SELECT max(x) FROM t)", 64)
    by = zorder_bucket_sql("y", "(SELECT min(y) FROM t)", "(SELECT max(y) FROM t)", 64)
    sql = (
        f"WITH b AS (SELECT id, {bx} AS zb_x, {by} AS zb_y FROM t) "
        f"SELECT id, zb_x, zb_y, {zorder_key_sql(['zb_x', 'zb_y'], 6)} AS zkey FROM b"
    )
    for rid, zx, zy, zk in con.execute(sql).fetchall():
        assert got[rid] == (zx, zy, zk)


def test_zorder_validation(spark):
    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError):
        zorder_key(df, [], bits=8)
    with pytest.raises(ValueError):
        zorder_key(df, ["v"], bits=0)
    with pytest.raises(ValueError):
        zorder_key(df, ["v"] * 8, bits=8)


def test_zorder_rejects_duplicate_cols(spark):
    # r5 ADVICE: ["v", "v"] used to emit two identical zb_v aliases
    # (ambiguous column / degenerate key); now a ValueError up front
    df = spark.createDataFrame([(1, 2)], "v long, w long")
    with pytest.raises(ValueError, match="distinct"):
        zorder_key(df, ["v", "v"], bits=4)


def test_zorder_span_guard_raises_on_overflow(spark):
    # r5 ADVICE: span >= 2^(63-bits) would silently wrap the int64
    # bucket multiply in non-ANSI mode (ANSI Spark / DuckDB abort —
    # engine divergence). The guard must raise at runtime instead.
    wide = spark.createDataFrame(
        [(0, 0), (1, 1 << 60)], "id long, v long"
    )
    out = zorder_key(wide, ["v"], bits=8)  # lazy: no error yet
    with pytest.raises(Exception, match="zorder_key: span"):
        out.collect()
    # same data at bits low enough to fit must pass clean
    ok = zorder_key(wide, ["v"], bits=2).collect()
    assert {r.zb_v for r in ok} == {0, 3}


def test_zorder_span_guard_raises_on_all_null_column(spark):
    nulls = spark.createDataFrame(
        [(0, None), (1, None)], "id long, v long"
    )
    with pytest.raises(Exception, match="zorder_key: span"):
        zorder_key(nulls, ["v"], bits=4).collect()


def test_conversation_entropy_hand_math(spark, tiny_events):
    import math

    from parallel_pagerank_spark.sources.events import (
        conversation_entropy,
    )

    got = {
        r.user_id: (r.n_events, r.n_tools, r.entropy, r.entropy_ratio)
        for r in conversation_entropy(tiny_events).collect()
    }
    assert set(got) == {1, 2, 3}  # NULL conv dropped
    # conv 1: a:2, b:1, c:1 over T=4
    h1 = math.log(4) - (2 * math.log(2)) / 4
    assert got[1][0] == 4 and got[1][1] == 3
    assert got[1][2] == pytest.approx(h1, abs=1e-12)
    assert got[1][3] == pytest.approx(h1 / math.log(3), abs=1e-12)
    # conv 2: b:2 — single tool => H = 0, ratio 0 by convention
    assert got[2] == (2, 1, 0.0, 0.0)
    # conv 3: single event, single tool
    assert got[3] == (1, 1, 0.0, 0.0)


def test_conversation_entropy_uniform_ratio_is_one(spark):
    from parallel_pagerank_spark.sources.events import (
        conversation_entropy,
    )

    rows = [(i, _ts(i), 7, f"t{i % 4}") for i in range(8)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    r = conversation_entropy(ev).collect()[0]
    assert r.entropy_ratio == pytest.approx(1.0, abs=1e-12)
