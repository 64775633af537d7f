"""As-of (most-recent-prior) join over keyed event streams.

The temporal enrichment primitive every event/transcript pipeline needs
(attribute each action to the latest preceding context row: click → the
view that led to it, tool call → the turn that issued it, trade → the
quote in force). Spark has no ASOF JOIN operator; the naive formulation
is a non-equi range join (quadratic per key). This implements the
standard distributed reduction to ONE equi-shuffle:

1. union the two sides into a single keyed stream, right rows carrying
   their payload in a struct, left rows carrying null;
2. per key, in (ts, side) order, each left row reads
   ``last(payload, ignorenulls=True)`` over the preceding rows — the
   most recent right row at-or-before (``strict=False``, right sorts
   before left on ties) / strictly-before (``strict=True``, right sorts
   after left) its timestamp;
3. keep the left rows.

Cost: one shuffle keyed on the join key and a per-key sort — identical
shape to sessionization (``functions/sessions.py``); skew is bounded by
per-key event counts, never by cross-side fan-out, so a hot key costs
O(its rows log its rows), not O(left_rows × right_rows). At 100 TB this
is the only shape that survives: no range-bucketing tuning, no
broadcast requirement on either side.

Timestamps compare as exact epoch microseconds (``unix_micros`` ↔
DuckDB ``epoch_us``), so match decisions and reported gaps are integer-
exact across engines. Within one key, right rows must be unique per
timestamp for the match to be well-defined (pre-aggregate duplicates —
the driver query keeps ``max(event_id)``); among equal-key equal-ts
right rows the LAST in the deterministic (ts, side) order wins, and the
optional ``tie_col`` extends that order so reruns are bit-stable even
then.

No reference counterpart (the reference consumes a prepared edge list:
/root/reference/pagerank_mpi/csr_graph.c); this is transcript-side
derivation machinery in the spirit of SURVEY §2 E1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts_col: str = "ts",
    strict: bool = False,
    tolerance_us: int | None = None,
    right_prefix: str = "r_",
    tie_col: str | None = None,
) -> DataFrame:
    """Left as-of join → every ``left`` row plus the latest ``right``
    row (same key) at-or-before its timestamp.

    Output = all of ``left``'s columns, plus for every non-key
    ``right`` column ``c`` a ``{right_prefix}c`` column (null when no
    right row qualifies), plus ``{right_prefix}ts_us`` (the matched
    right timestamp, exact epoch µs) and ``gap_us`` (left ts − matched
    ts, ≥ 0, null on no match).

    ``strict=True`` excludes equal timestamps (strictly before).
    ``tolerance_us`` voids matches older than the given horizon —
    equivalent to ASOF-with-tolerance; the join itself is unchanged,
    the match is nulled after the fact so the plan stays one shuffle.
    ``tie_col`` (a right column name) breaks equal-(key, ts) right ties
    by largest value; without it such ties resolve by union order and
    should be pre-aggregated away.
    """
    keys = [on] if isinstance(on, str) else list(on)
    for k in keys:
        if k not in left.columns or k not in right.columns:
            raise ValueError(f"join key {k!r} must exist on both sides")
    if ts_col not in left.columns or ts_col not in right.columns:
        raise ValueError(f"ts_col {ts_col!r} must exist on both sides")
    if tolerance_us is not None and tolerance_us < 0:
        raise ValueError(f"tolerance_us must be >= 0, got {tolerance_us}")
    rpay = [c for c in right.columns if c not in keys and c != ts_col]
    if tie_col is not None and tie_col not in rpay:
        raise ValueError(f"tie_col {tie_col!r} must be a right payload column")

    def us(c: Column) -> Column:
        return F.unix_micros(c.cast("timestamp"))

    # side: right sorts BEFORE left at equal ts for inclusive semantics
    # (a right row at the same instant is visible), AFTER it for strict.
    r_side, l_side = (0, 1) if not strict else (2, 1)
    lid = "__asof_lid"
    left_tagged = (
        left.withColumn(lid, F.monotonically_increasing_id())
        .select(
            *keys,
            us(F.col(ts_col)).alias("__ts_us"),
            F.lit(l_side).alias("__side"),
            F.lit(None).cast("long").alias("__tie"),
            F.struct(*[F.col(c) for c in left.columns], F.col(lid)).alias(
                "__lrow"
            ),
            F.lit(None)
            .cast(
                "struct<"
                + ",".join(
                    f"`{c}`:{right.schema[c].dataType.simpleString()}"
                    for c in rpay
                )
                + ",`__rts`:bigint>"
                if rpay
                else "struct<`__rts`:bigint>"
            )
            .alias("__rrow"),
        )
    )
    right_tagged = right.select(
        *keys,
        us(F.col(ts_col)).alias("__ts_us"),
        F.lit(r_side).alias("__side"),
        (
            F.col(tie_col).cast("long")
            if tie_col is not None
            else F.lit(0).cast("long")
        ).alias("__tie"),
        F.lit(None)
        .cast(left_tagged.schema["__lrow"].dataType)
        .alias("__lrow"),
        F.struct(
            *[F.col(c) for c in rpay],
            us(F.col(ts_col)).alias("__rts"),
        ).alias("__rrow"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts_us", "__side", "__tie")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        left_tagged.unionByName(right_tagged)
        .withColumn("__m", F.last("__rrow", ignorenulls=True).over(w))
        .filter(F.col("__lrow").isNotNull())
    )
    m = F.col("__m")
    if tolerance_us is not None:
        m = F.when(
            F.col("__ts_us") - F.col("__m.__rts") <= F.lit(tolerance_us),
            F.col("__m"),
        )
    out_cols = [
        F.col(f"__lrow.{c}").alias(c) for c in left.columns
    ] + [m[c].alias(right_prefix + c) for c in rpay]
    out_cols.append(m["__rts"].alias(right_prefix + "ts_us"))
    out_cols.append((F.col("__ts_us") - m["__rts"]).alias("gap_us"))
    return matched.select(*out_cols)
