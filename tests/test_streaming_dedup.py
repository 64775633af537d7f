"""Streaming exact dedup: cross-micro-batch duplicate suppression must
match the batch dedup on the same corpus."""

from __future__ import annotations

import glob
import os
import time

import pytest
from pyspark.sql import Window, functions as F

from parallel_pagerank_spark.functions.dedup import exact_dedup
from parallel_pagerank_spark.streaming.dedup import (
    fingerprinted,
    streaming_dedup_counts,
    streaming_exact_dedup,
)

DOC_SCHEMA = "doc_id long, text string"

BATCH_A = [
    (0, "alpha beta gamma"),
    (1, "delta epsilon zeta"),
    (2, "alpha beta gamma"),  # dup of 0, same batch
]
BATCH_B = [
    (3, "alpha beta gamma"),  # dup of 0, LATER batch
    (4, "eta theta iota"),
    (5, "delta  epsilon\tzeta"),  # dup of 1 modulo normalization
]


def _write_two_batches(spark, tmp_path):
    in_dir = str(tmp_path / "docs_in")
    spark.createDataFrame(BATCH_A, DOC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    first = set(glob.glob(f"{in_dir}/*.parquet"))
    spark.createDataFrame(BATCH_B, DOC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    now = time.time()
    for f in first:
        os.utime(f, (now - 60, now - 60))
    return in_dir


def _stream_docs(spark, in_dir):
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )


def test_streaming_exact_dedup_matches_batch(spark, tmp_path):
    in_dir = _write_two_batches(spark, tmp_path)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    q = (
        streaming_exact_dedup(_stream_docs(spark, in_dir))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    # one survivor per distinct content: 3 distinct fingerprints
    assert got.count() == 3
    assert got.select("fingerprint").distinct().count() == 3
    # the batch operator agrees on WHAT is duplicate content
    batch = exact_dedup(
        spark.createDataFrame(BATCH_A + BATCH_B, DOC_SCHEMA)
    )
    assert {r["fingerprint"] for r in got.collect()} == {
        r["fingerprint"] for r in batch.collect()
    }
    # cross-batch dup (doc 3) and normalization dup (doc 5) suppressed
    survivors = {r["doc_id"] for r in got.collect()}
    assert 3 not in survivors and 5 not in survivors and 2 not in survivors


def test_streaming_dedup_counts_final_state(spark, tmp_path):
    in_dir = _write_two_batches(spark, tmp_path)
    out = str(tmp_path / "out2")
    ck = str(tmp_path / "ck2")
    q = (
        streaming_dedup_counts(_stream_docs(spark, in_dir))
        .writeStream.format("memory")
        .queryName("dedup_counts")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    upd = spark.sql("SELECT * FROM dedup_counts")
    # LAST update per fingerprint = final running state
    final = {
        r["fingerprint"]: r
        for r in upd.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("fingerprint").orderBy(
                    F.desc("dup_count")
                )
            ),
        )
        .filter("rn = 1")
        .collect()
    }
    all_docs = spark.createDataFrame(BATCH_A + BATCH_B, DOC_SCHEMA)
    fps = {
        r["doc_id"]: r["fingerprint"]
        for r in fingerprinted(all_docs).collect()
    }
    fp_alpha, fp_delta, fp_eta = fps[0], fps[1], fps[4]
    assert fps[2] == fp_alpha and fps[3] == fp_alpha and fps[5] == fp_delta
    assert final[fp_alpha]["dup_count"] == 3
    assert final[fp_alpha]["keep_id"] == 0  # first batch, min id
    assert final[fp_delta]["dup_count"] == 2
    assert final[fp_delta]["keep_id"] == 1
    assert final[fp_eta]["dup_count"] == 1
    assert final[fp_eta]["keep_id"] == 4
