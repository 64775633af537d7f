"""Structured-Streaming ingest: incremental transcript → edge derivation.

The reference is purely batch (SURVEY.md §2 H: no streaming anywhere); this
module is the engine-side extension a continuously-ingesting transcript
pipeline needs: conversations arrive turn-by-turn across micro-batches, and
reply links must connect a batch's first turn to the LAST turn seen in a
previous batch — cross-batch state, held per conv_id with
``applyInPandasWithState`` (Arrow-vectorized, grouped state, the Spark-native
custom stateful operator).

Semantics match the batch derivation (operators/derive.py E1 reply links,
hash id_mode): running the stream over any file split of the same
transcripts yields the same edge set as one batch run — tested. Contract:
turns of a conversation arrive in (turn_idx) order across micro-batches
(the file source orders batches by file modification time); an out-of-order
turn is dropped from linking, never mis-linked.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..sources.transcripts import TRANSCRIPT_SCHEMA

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_turn_idx", T.IntegerType(), True),
        T.StructField("last_id", T.LongType(), True),
    ]
)


def stream_transcripts(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream of transcript rows (parquet drops into ``path``)."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def _xxhash64_pandas(conv_id: pd.Series, turn_idx: pd.Series) -> pd.Series:
    """Must match F.xxhash64(conv_id, turn_idx) — we instead carry the ids
    precomputed on the stream (see streaming_reply_edges), so this helper
    only documents the contract."""
    raise NotImplementedError


def _reply_state_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values("turn_idx")
    if state.exists:
        last_turn, last_id = state.get
    else:
        last_turn, last_id = None, None
    src, dst = [], []
    for turn, vid in zip(rows["turn_idx"], rows["id"]):
        turn = int(turn)
        if last_id is not None and turn == last_turn + 1:
            src.append(int(last_id))
            dst.append(int(vid))
        # only advance past the max-seen turn: a late (out-of-order) turn is
        # skipped without regressing the chain head, so the NEXT in-order
        # turn still links correctly
        if last_turn is None or turn > last_turn:
            last_turn, last_id = turn, int(vid)
    state.update((last_turn, last_id))
    yield pd.DataFrame({"src": pd.Series(src, dtype="int64"),
                        "dst": pd.Series(dst, dtype="int64")})


def streaming_reply_edges(transcripts_stream: DataFrame) -> DataFrame:
    """Incremental reply-link derivation: per conv_id, link consecutive
    turn_idx values across micro-batches. Vertex ids =
    xxhash64(conv_id, turn_idx) computed JVM-side before the stateful step
    (the Python state fn only chains precomputed ids — no hashing drift)."""
    with_ids = transcripts_stream.select(
        "conv_id",
        "turn_idx",
        F.xxhash64("conv_id", "turn_idx").alias("id"),
    )
    return with_ids.groupBy("conv_id").applyInPandasWithState(
        _reply_state_fn,
        outputStructType=EDGE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_HANDOFF_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts_us", T.LongType(), True),
        T.StructField("last_conv", T.StringType(), True),
        T.StructField("last_turn", T.IntegerType(), True),
        T.StructField("last_id", T.LongType(), True),
    ]
)


def _handoff_state_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts_us", "conv_id", "turn_idx"])
    if state.exists:
        last_ts, last_conv, last_turn, last_id = state.get
        last_key = (last_ts, last_conv, last_turn)
    else:
        last_key, last_id = None, None
    src, dst = [], []
    for ts_us, conv, turn, vid in zip(
        rows["ts_us"], rows["conv_id"], rows["turn_idx"], rows["id"]
    ):
        okey = (int(ts_us), str(conv), int(turn))
        if last_key is not None and okey <= last_key:
            # late arrival behind the chain head: skip without regressing
            # state (mirrors the reply-link out-of-order contract)
            continue
        if last_id is not None:
            src.append(int(last_id))
            dst.append(int(vid))
        last_key, last_id = okey, int(vid)
    if last_key is not None:
        state.update((last_key[0], last_key[1], last_key[2], last_id))
    yield pd.DataFrame({"src": pd.Series(src, dtype="int64"),
                        "dst": pd.Series(dst, dtype="int64")})


def streaming_handoff_edges(transcripts_stream: DataFrame) -> DataFrame:
    """Incremental tool-handoff derivation: per TOOL, chain every
    consecutive tool-invoking turn in (ts, conv_id, turn_idx) order across
    micro-batches — the streaming counterpart of batch
    ``derive_edges(handoff_links=True)`` (operators/derive.py). State per
    tool holds the chain head (ordering key + vertex id); contract: rows
    arrive in (ts, conv_id, turn_idx) order per tool across batches, a late
    row is skipped, never mis-linked."""
    with_ids = transcripts_stream.filter(F.col("tool").isNotNull()).select(
        "tool",
        "conv_id",
        "turn_idx",
        F.unix_micros("ts").alias("ts_us"),
        F.xxhash64("conv_id", "turn_idx").alias("id"),
    )
    return with_ids.groupBy("tool").applyInPandasWithState(
        _handoff_state_fn,
        outputStructType=EDGE_SCHEMA,
        stateStructType=_HANDOFF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_turn_counts(
    transcripts_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Late-data-tolerant windowed throughput metrics: turns per (window,
    role), watermarked on event time — the streaming analog of the
    reference's per-iteration stdout metrics line."""
    return (
        transcripts_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "role")
        .agg(F.count("*").alias("n_turns"))
    )


def run_stream_to_parquet(
    edges_stream: DataFrame,
    out_path: str,
    checkpoint_path: str,
) -> None:
    """Drain all available input (availableNow) into parquet with exactly-
    once file-sink semantics; blocks until done. The checkpoint dir makes
    the ingest resumable — the streaming counterpart of the superstep
    manifest."""
    q = (
        edges_stream.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
