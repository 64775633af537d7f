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
