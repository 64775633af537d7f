"""Bucketed edge storage: co-located joins with ZERO runtime exchange.

At 100 TB the dominant cost of the per-superstep gather join is the
shuffle of the big edge table. Persisting in-session caches is one answer
(operators/pagerank.py); the DURABLE answer is Hive-style bucketing: write
the edge table once, hash-bucketed (and sorted) on the join key, and every
subsequent join against an identically-bucketed table — or against a
bucketed copy of itself across jobs/sessions — plans with no Exchange on
either side. Bucket count should match (or evenly divide into)
spark.sql.shuffle.partitions so bucket-pruning and AQE stay effective.

Spark only honors bucketing metadata through the catalog (saveAsTable),
not through plain parquet paths — hence the table-name API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str = "src",
    buckets: int = 32,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed (+ sorted) parquet table. ``path`` makes
    it an external table (data at the given location)."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(buckets, *cols)
    )
    if sort:
        w = w.sortBy(*cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — carries the bucketing spec into the planner, so
    joins/aggregations on the bucket key skip their Exchange."""
    return spark.table(table)
