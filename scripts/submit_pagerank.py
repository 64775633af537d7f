"""spark-submit entry point (north rule: `spark-submit --py-files` runs).

Usage:
    zip -qr /tmp/ppr.zip parallel_pagerank_spark
    spark-submit --master <master> --py-files /tmp/ppr.zip \
        scripts/submit_pagerank.py <transcripts_path_or_table> <out_dir> \
        [--tol 1e-6] [--damping 0.85] [--max-iter 200] \
        [--checkpoint-dir DIR] [--resume] [--id-mode hash|dense]

Reads transcripts (Iceberg table name or parquet path), derives the link
graph, runs PageRank to convergence, writes ranks parquet + metrics JSON.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("source")
    ap.add_argument("out_dir")
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument("--max-iter", type=int, default=200)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--id-mode", default="hash", choices=["hash", "dense"])
    ap.add_argument("--salt-buckets", type=int, default=0)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("ppr-submit").getOrCreate()
    from parallel_pagerank_spark.config import PageRankConfig
    from parallel_pagerank_spark.operators.derive import (
        derive_edges,
        turn_vertices,
    )
    from parallel_pagerank_spark.operators.pagerank import pagerank
    from parallel_pagerank_spark.plans.metrics import metrics_to_json
    from parallel_pagerank_spark.sources.transcripts import read_transcripts

    transcripts = read_transcripts(spark, args.source)
    edges = derive_edges(transcripts, id_mode=args.id_mode)
    vertices = turn_vertices(transcripts, id_mode=args.id_mode).select(
        "id"
    ).distinct()
    res = pagerank(
        edges,
        vertices=vertices,
        config=PageRankConfig(
            damping=args.damping,
            tol=args.tol,
            max_iter=args.max_iter,
            checkpoint_dir=args.checkpoint_dir,
            salt_buckets=args.salt_buckets,
        ),
        resume=args.resume,
    )
    res.ranks.write.mode("overwrite").parquet(
        os.path.join(args.out_dir, "ranks")
    )
    os.makedirs(args.out_dir, exist_ok=True)
    metrics_to_json(res.metrics, os.path.join(args.out_dir, "metrics.json"))
    summary = {
        "iterations": res.iterations,
        "converged": res.converged,
        "final_l1": res.metrics[-1]["l1"] if res.metrics else None,
    }
    with open(os.path.join(args.out_dir, "summary.json"), "w") as f:
        json.dump(summary, f)
    print(json.dumps(summary))
    spark.stop()
    sys.exit(0 if res.converged else 2)


if __name__ == "__main__":
    main()
