"""Z-order (Morton) layout keys for multi-dimensional data clustering.

The 100 TB table-layout primitive: writing files clustered by the
bit-interleaved key of two or more scan-predicate columns gives every
one of those columns locality inside each file, so min/max file
statistics prune scans on ANY of the interleaved dimensions (the
Delta/Iceberg ``OPTIMIZE ZORDER BY`` idea, public since the original
Morton 1966 ordering and Orenstein & Merrett PODS'84). The reference
engine has no layout pass at all — its edge lists are flat text files
(``/root/reference/pagerank_mpi/csr_graph.c`` reads a raw edge list) —
but an engine meant to scan transcript tables at 10^12-turn scale needs
one: clustering events by (conversation, time) makes both per-user
timeline reads and time-window reads prune.

Everything here is exact int64 arithmetic in pure Column expressions
(whole-stage codegen, no Python), chosen so a SQL engine replays it
bit-for-bit:

- bucketing uses true integer division ``(v - lo) * n_buckets div
  (hi - lo + 1)`` — NOT IEEE ``/`` + floor (the distribution_drift
  lesson: float bucketing can misplace extreme values);
- interleaving is shifts/ands/ors only.

Precondition, ENFORCED at runtime by a span guard folded into each
bucket expression: ``(hi - lo) * 2^bits`` must fit in int64, i.e. the
column span is below ``2^(63 - bits)`` — comfortably true for
epoch-microsecond timestamps (about 2^45) and dense id spaces at the
default 8 bits. A wider span (or an all-NULL column, which has no
bounds at all) raises instead of silently wrapping the int64 multiply
in non-ANSI mode — ANSI Spark and DuckDB would abort on the overflow,
so without the guard the two engines would diverge.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    key_name: str = "zkey",
) -> DataFrame:
    """Append per-column equi-width buckets ``zb_<col>`` (int64 in
    [0, 2^bits)) and the Morton-interleaved layout key ``<key_name>``
    to ``df``.

    Bit layout: bit ``i`` of bucket ``j`` lands at position
    ``i * len(cols) + j`` of the key — the classic Morton interleave,
    so close keys are close in EVERY interleaved dimension at
    matching granularity. ``bits * len(cols)`` must stay below 63.

    Scale shape: ONE aggregation computes all column bounds in a
    single scan, broadcast back as a 1-row frame (lazy plan — the
    hot_keys / distribution_drift precedent), then buckets and key are
    pure scan-side Column expressions. Writing
    ``df.repartitionByRange(n, key).sortWithinPartitions(key)`` after
    this produces the clustered files; this function only computes the
    key so the write policy stays the caller's.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    if len(set(cols)) != len(cols):
        raise ValueError(f"cols must be distinct, got {cols}")
    if bits < 1 or bits * len(cols) > 62:
        raise ValueError(
            f"bits * len(cols) must be in [1, 62], got {bits}*{len(cols)}"
        )
    n_buckets = 1 << bits
    span_limit = 1 << (63 - bits)
    bounds = df.agg(
        *[F.min(F.col(c).cast("long")).alias(f"__lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("long")).alias(f"__hi_{c}") for c in cols],
    )
    out = df.crossJoin(F.broadcast(bounds))
    ncols = len(cols)
    bucket_exprs = []
    for c in cols:
        # Spark SQL `div` is true int64 integer division — exact for the
        # full range (an IEEE `/` + floor detour would round numerators
        # above 2^53 before dividing). DuckDB mirrors it with `//`.
        # The ifnull(assert_true(...), 0L) term is the span guard: it
        # adds exactly 0 when the precondition holds, raises (instead
        # of wrapping the multiply) when the span is >= 2^(63-bits) or
        # the column is all-NULL. It references only the broadcast
        # 1-row bounds. It is the LEFT operand of the + deliberately:
        # binary-op codegen short-circuits on a null left operand, so
        # guard-on-the-right would be skipped for NULL cell values.
        guard = (
            f"ifnull(assert_true(coalesce(`__hi_{c}` - `__lo_{c}` < "
            f"{span_limit}L, false), 'zorder_key: span of column {c} is >= "
            f"2^(63 - bits) (or the column is all NULL); the bucket "
            f"multiply would overflow int64 — lower bits or pre-scale "
            f"the column'), 0L)"
        )
        bucket_exprs.append(
            F.expr(
                f"{guard} + (((cast(`{c}` as bigint) - `__lo_{c}`) "
                f"* {n_buckets}L) div (`__hi_{c}` - `__lo_{c}` + 1L))"
            ).alias(f"zb_{c}")
        )
    out = out.select(*df.columns, *bucket_exprs)
    terms = []
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(F.col(f"zb_{c}"), i).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, i * ncols + j))
    key = reduce(lambda a, b: a + b, terms).cast("long").alias(key_name)
    return out.select(*df.columns, *[f"zb_{c}" for c in cols], key)


def zorder_bucket_sql(col: str, lo: str, hi: str, n_buckets: int) -> str:
    """The DuckDB mirror of one bucket term (true integer division
    ``//``) — used by the driver oracle so both engines share the exact
    arithmetic."""
    return (
        f"(({col}::BIGINT - {lo}) * {n_buckets}) // ({hi} - {lo} + 1)"
    )


def zorder_key_sql(bucket_cols: list[str], bits: int) -> str:
    """The DuckDB mirror of the interleave: sum of shifted bits over
    already-computed bucket columns."""
    ncols = len(bucket_cols)
    terms = [
        f"((({b} >> {i}) & 1) << {i * ncols + j})"
        for i in range(bits)
        for j, b in enumerate(bucket_cols)
    ]
    return " + ".join(terms)
