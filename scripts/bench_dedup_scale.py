"""Dedup/ANN throughput at a 10^6-document tier (VERDICT r2 #8).

The sf0.1 driver sweep measures the graph ops at scale but caps the LLM
ops at 10^5 documents; this script gives the dedup scale claims a
measured point one decade up, on a DETERMINISTIC synthetic corpus built
entirely JVM-side (hash-derived words — no data files, no RNG state):

- minhash_lsh_candidates: 64 minhashes / 16 bands over 5-char shingles
- simhash: 64-bit Charikar fingerprints
- embedding_near_dups (SRP-LSH scale path): dim-64 synthetic vectors

~1% exact duplicate pairs are injected (ids = 0 mod 101 reuse the text of
the previous 0-mod-101 id) so the candidate stages do real pair work.

Usage: python scripts/bench_dedup_scale.py [n_docs] [n_vecs]
Prints one JSON line; the committed run is BENCH/bench_dedup_scale.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_docs(spark, n: int, words_per_doc: int = 40):
    """(doc_id, text): ~words_per_doc pseudo-words of 5-7 chars, fully
    derived from xxhash64(doc_seed, position) — deterministic, JVM-side.
    doc_seed collapses ids ≡ 0 (mod 101) onto the immediately preceding
    id (whose seed is itself), so ~1% of docs are exact duplicates of
    another doc."""
    from pyspark.sql import functions as F

    ids = spark.range(n).withColumnRenamed("id", "doc_id")
    seed = F.when(
        (F.col("doc_id") % 101 == 0) & (F.col("doc_id") >= 1),
        F.col("doc_id") - 1,
    ).otherwise(F.col("doc_id"))
    word = lambda i: F.substring(  # noqa: E731
        F.conv(
            F.pmod(F.xxhash64(seed, i), F.lit(36 ** 7)).cast("string"),
            10,
            36,
        ),
        1,
        5 + (i % 3),
    )
    text = F.concat_ws(
        " ", F.array(*[word(F.lit(i)) for i in range(words_per_doc)])
    )
    return ids.select("doc_id", F.lower(text).alias("text"))


def synthetic_vectors(spark, n: int, dim: int = 64):
    """(vec_id, embedding: array<double>) with ~0.3% exact-copy pairs."""
    from pyspark.sql import functions as F

    ids = spark.range(n).withColumnRenamed("id", "vec_id")
    seed = F.when(
        (F.col("vec_id") % 331 == 0) & (F.col("vec_id") >= 1),
        F.col("vec_id") - 1,
    ).otherwise(F.col("vec_id"))
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda j: (
            F.pmod(F.xxhash64(seed, j), F.lit(2001)) - F.lit(1000)
        ).cast("double")
        / F.lit(1000.0),
    )
    return ids.select("vec_id", vec.alias("embedding"))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    from parallel_pagerank_spark import get_spark
    from parallel_pagerank_spark.functions.dedup import (
        embedding_near_dups,
        exact_dedup,
        minhash_lsh_candidates,
        simhash,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench-dedup-scale", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = synthetic_docs(spark, n_docs).repartition(cpus * 2).cache()
    docs.count()  # materialize the corpus outside the timed sections
    out: dict = {"n_docs": n_docs, "n_vecs": n_vecs}

    t0 = time.monotonic()
    n_groups = exact_dedup(docs).count()
    out["exact_dedup_sec"] = round(time.monotonic() - t0, 3)
    out["exact_groups"] = n_groups

    t0 = time.monotonic()
    n_cand = minhash_lsh_candidates(docs).count()
    out["minhash_lsh_sec"] = round(time.monotonic() - t0, 3)
    out["minhash_candidates"] = n_cand
    out["minhash_docs_per_sec"] = round(n_docs / out["minhash_lsh_sec"], 1)

    t0 = time.monotonic()
    # full-row checksum: a bare count() would let Catalyst prune the
    # simhash column and time only the synthetic-text generation
    from pyspark.sql import functions as F

    simhash(docs).select(
        F.xxhash64(F.struct("*")).alias("h")
    ).agg(F.bit_xor("h")).collect()
    out["simhash_sec"] = round(time.monotonic() - t0, 3)
    out["simhash_docs_per_sec"] = round(n_docs / out["simhash_sec"], 1)
    docs.unpersist()

    vecs = synthetic_vectors(spark, n_vecs).repartition(cpus * 2).cache()
    vecs.count()
    t0 = time.monotonic()
    n_pairs = embedding_near_dups(
        vecs, threshold=0.9, method="lsh", dim=64
    ).count()
    out["emb_near_dups_sec"] = round(time.monotonic() - t0, 3)
    out["emb_pairs"] = n_pairs
    out["emb_vecs_per_sec"] = round(n_vecs / out["emb_near_dups_sec"], 1)
    vecs.unpersist()

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
