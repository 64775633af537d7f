"""Sessionization — gap-based event sessions per user.

No reference counterpart; a first-class training-data-pipeline operator
(conversation/agent logs are sessionized before linking/analysis). Pure
window expressions (lag + running sum), fully SQL-expressible so the driver
gate can cross-check it against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """→ ``(event_id, user_id, session_idx, *keep_cols)``: a new session
    starts when the gap to the previous event of the same user exceeds
    ``gap_seconds``. session_idx is 1-based per user, assigned in the
    stable (ts, event_id) order. ``keep_cols`` are carried through the
    projection so downstream aggregations need no re-join."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev_ts = F.lag(ts_col).over(w)
    new_sess = (
        prev_ts.isNull()
        | (
            (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts))
            > gap_seconds
        )
    ).cast("long")
    run = Window.partitionBy(user_col).orderBy(ts_col, id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.select(
        id_col,
        user_col,
        F.sum(new_sess).over(run).alias("session_idx"),
        *keep_cols,
    )


def session_window_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Spark-NATIVE session windows (``F.session_window``): one
    aggregation, no window-function sort pipeline — and the identical
    code path works on a STREAMING DataFrame (add ``withWatermark`` and
    closed sessions emit in append mode as the watermark passes them).
    → ``(user_id, session_start, session_end, n_events)``.

    Boundary semantics: session_window merges an event while the gap to
    the session end is STRICTLY less than ``gap``; ``sessionize`` starts a
    new session when the gap EXCEEDS gap_seconds — they differ only for
    events at exactly the gap boundary."""
    return (
        events.groupBy(
            F.session_window(F.col(ts_col), gap), F.col(user_col)
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            user_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def session_stats(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-session summary: ``(user_id, session_idx, n_events,
    duration_sec)`` (epoch-second arithmetic — portable across engines).
    The epoch column rides through sessionize's projection — one window
    pipeline + one aggregation, no re-join against the input."""
    sess = sessionize(
        events.withColumn("epoch", F.unix_timestamp(ts_col)),
        gap_seconds,
        user_col,
        ts_col,
        id_col,
        keep_cols=("epoch",),
    )
    return sess.groupBy(user_col, "session_idx").agg(
        F.count("*").alias("n_events"),
        (F.max("epoch") - F.min("epoch")).alias("duration_sec"),
    )
