"""Streaming edge derivation: incremental (cross-micro-batch) reply links
must equal the batch derivation on the same data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parallel_pagerank_spark.operators.derive import derive_edges
from parallel_pagerank_spark.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    synthetic_transcripts,
)
from parallel_pagerank_spark.streaming.edges import (
    run_stream_to_parquet,
    stream_transcripts,
    streaming_reply_edges,
)


def test_streaming_matches_batch(spark, tmp_path):
    tr = synthetic_transcripts(spark, n_conversations=25, seed=7)
    # prefix-split each conversation across TWO files (turns <4 arrive in
    # the first micro-batch, the rest later) so reply links must cross the
    # micro-batch boundary through the per-conv state
    in_dir = str(tmp_path / "in")
    part_a = tr.filter(F.col("turn_idx") < 4)
    part_b = tr.filter(F.col("turn_idx") >= 4)
    part_a.coalesce(1).write.mode("append").parquet(in_dir)
    import glob
    import os
    import time

    first_files = set(glob.glob(f"{in_dir}/*.parquet"))
    part_b.coalesce(1).write.mode("append").parquet(in_dir)
    # the file source orders micro-batches by modification time (second
    # granularity) — make the arrival order unambiguous (the incremental
    # contract is in-order arrival per conversation)
    now = time.time()
    for f in first_files:
        os.utime(f, (now - 60, now - 60))

    stream = stream_transcripts(spark, in_dir, max_files_per_trigger=1)
    edges_stream = streaming_reply_edges(stream)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    run_stream_to_parquet(edges_stream, out, ck)

    got = {
        (r["src"], r["dst"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["src"], r["dst"])
        for r in derive_edges(
            tr, id_mode="hash", handoff_links=False
        ).collect()
    }
    # the split by parity puts turns 0,1 in batch A and 2,3 in batch B etc;
    # within-batch pairs (2→3) and the cross-batch pair (3→4) must appear
    assert got == want
    assert len(got) > 0


def test_streaming_resume_processes_new_files_only(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    rows1 = [("c", 0, "user", "a", None, None), ("c", 1, "assistant", "b", None, None)]
    spark.createDataFrame(rows1, TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    run_stream_to_parquet(
        streaming_reply_edges(stream_transcripts(spark, in_dir)), out, ck
    )
    n1 = spark.read.parquet(out).count()
    assert n1 == 1

    rows2 = [("c", 2, "user", "c", None, None)]
    spark.createDataFrame(rows2, TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    run_stream_to_parquet(
        streaming_reply_edges(stream_transcripts(spark, in_dir)), out, ck
    )
    # resume from checkpoint: only the new turn is processed, linking 1→2
    # through the persisted per-conv state
    assert spark.read.parquet(out).count() == 2


def test_streaming_handoff_matches_batch(spark, tmp_path):
    """Cross-batch tool-handoff chaining: a time-prefix split (all of batch
    A precedes batch B in ts) must reproduce the batch handoff edge set,
    with the A→B boundary link carried through per-tool state."""
    import glob
    import os
    import time

    from parallel_pagerank_spark.streaming.edges import (
        streaming_handoff_edges,
    )

    tr = synthetic_transcripts(spark, n_conversations=30, seed=11)
    cutoff = "conv-000015"
    in_dir = str(tmp_path / "in")
    part_a = tr.filter(F.col("conv_id") < cutoff)
    part_b = tr.filter(F.col("conv_id") >= cutoff)
    part_a.coalesce(1).write.mode("append").parquet(in_dir)
    first_files = set(glob.glob(f"{in_dir}/*.parquet"))
    part_b.coalesce(1).write.mode("append").parquet(in_dir)
    now = time.time()
    for f in first_files:
        os.utime(f, (now - 60, now - 60))

    stream = stream_transcripts(spark, in_dir, max_files_per_trigger=1)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    run_stream_to_parquet(streaming_handoff_edges(stream), out, ck)

    got = {
        (r["src"], r["dst"]) for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["src"], r["dst"])
        for r in derive_edges(
            tr, id_mode="hash", reply_links=False
        ).collect()
    }
    assert got == want
    assert len(got) > 0
    # at least one link must cross the batch boundary (chains span convs)
    a_ids = {
        r["id"]
        for r in part_a.select(
            F.xxhash64("conv_id", "turn_idx").alias("id")
        ).collect()
    }
    assert any(s in a_ids and d not in a_ids for s, d in got)


def test_streaming_out_of_order_turn_skipped(spark, tmp_path):
    """A late (out-of-order) turn is dropped from linking without breaking
    the links of subsequent in-order turns."""
    import glob
    import os
    import time

    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    batch1 = [("c", 0, "user", "a", None, None),
              ("c", 1, "assistant", "b", None, None),
              ("c", 3, "user", "d", None, None)]
    spark.createDataFrame(batch1, TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    first_files = set(glob.glob(f"{in_dir}/*.parquet"))
    # turn 2 arrives LATE (next micro-batch), then turn 4 in order
    batch2 = [("c", 2, "assistant", "c", None, None),
              ("c", 4, "assistant", "e", None, None)]
    spark.createDataFrame(batch2, TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    now = time.time()
    for f in first_files:
        os.utime(f, (now - 60, now - 60))

    run_stream_to_parquet(
        streaming_reply_edges(
            stream_transcripts(spark, in_dir, max_files_per_trigger=1)
        ),
        out,
        ck,
    )
    ids = {
        t: spark.createDataFrame([("c", t)], "conv_id string, turn_idx int")
        .select(F.xxhash64("conv_id", "turn_idx").alias("id"))
        .first()["id"]
        for t in range(5)
    }
    got = {(r["src"], r["dst"]) for r in spark.read.parquet(out).collect()}
    # 0→1 in batch 1; late turn 2 is skipped (state stays at turn 3), and
    # the in-order 3→4 link still forms
    assert got == {(ids[0], ids[1]), (ids[3], ids[4])}
