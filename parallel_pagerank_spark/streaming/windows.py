"""Watermarked tumbling-window aggregation over the event/transcript
stream — the Structured Streaming analog of sources/events.tool_stats.

The reference is purely batch (SURVEY.md §2 H: no watermark, window, or
state anywhere in it); this extension gives the engine the standard
streaming-ingest counting surface: per (window, key) event counts that
tolerate out-of-order arrival up to a bounded lateness and emit each
window exactly once when it finalizes.

Semantics (stock Structured Streaming, no custom state):

- tumbling windows of ``window_duration`` over the event-time column,
- watermark = max event time seen − ``watermark`` delay; a window
  emits (append mode) once the watermark passes its end,
- rows arriving LATER than the watermark are dropped, never
  double-counted — the emitted window is immutable.

The same function works on a BATCH DataFrame (``F.window`` is an
ordinary grouping expression there; the watermark is a no-op), which is
what the stream-vs-batch parity test exercises: closed windows from the
stream must equal the batch aggregation over the punctual rows.

Scale shape: one shuffle keyed on (window, key); state kept per open
window only and dropped at finalization, so steady-state memory is
O(open windows × keys) regardless of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """(window_start, window_end, *keys, n_events) tumbling counts."""
    src = (
        events.withWatermark(ts_col, watermark)
        if events.isStreaming
        else events
    )
    return (
        src.groupBy(
            F.window(F.col(ts_col), window_duration).alias("w"), *keys
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n_events",
        )
    )


def run_windowed_counts_to_parquet(
    windowed: DataFrame, out_dir: str, checkpoint_dir: str
) -> None:
    """Drain all available input through an append-mode parquet sink.

    Append mode is the exactly-once contract: a window row is written
    exactly when the watermark finalizes it. Blocks until every
    available micro-batch is processed (test/backfill helper — a
    production job would keep the query running instead)."""
    q = (
        windowed.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
