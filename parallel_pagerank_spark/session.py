"""SparkSession factory with the engine's physical defaults.

Single place where shuffle parallelism, AQE, and Arrow are configured
(SURVEY.md §4.3: explicit shuffle-partition tuning is part of the north rule).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .config import EngineConfig


def get_spark(
    app_name: str = "parallel-pagerank-spark",
    master: str | None = None,
    config: EngineConfig | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    master defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, fallback ``local[*]``)
    in the sandbox; on a real cluster pass ``None`` and let spark-submit decide.
    """
    cfg = config or EngineConfig()
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(cfg.shuffle_partitions))
        .config("spark.sql.files.maxPartitionBytes", cfg.max_partition_bytes)
        .config("spark.sql.adaptive.enabled", str(cfg.adaptive).lower())
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.execution.arrow.pyspark.enabled", str(cfg.arrow).lower()
        )
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "32g")
        )  # local mode: executors share the driver JVM — an undersized heap
        # GC-thrashes at high thread counts and kills scaling
        .config("spark.sql.autoBroadcastJoinThreshold", "32m")
        .config("spark.checkpoint.compress", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
