"""Edge-list text source — the reference's on-disk graph format.

Format (csr_graph.c:16-23; QUICKSTART.md:104-121): one ``from to`` integer
pair per line, tab or space separated, ``#`` comment lines skipped, malformed
lines silently dropped (the Python tooling's try/int/except-continue,
dashboard/app.py:1569-1576).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_edge_list(spark: SparkSession, path: str) -> DataFrame:
    """→ ``edges(src: long, dst: long)``. Duplicate lines are kept
    (multi-edge multiplicity affects rank flow, csr_graph.c:19-23)."""
    lines = spark.read.text(path)
    parts = (
        lines.filter(~F.col("value").startswith("#"))
        .select(F.split(F.trim(F.col("value")), r"\s+").alias("p"))
        .select(
            # try_cast, not cast: ANSI mode (Spark 4 default) makes a plain
            # cast THROW on malformed input; the reference silently drops
            # bad lines (csr_graph.c tolerant fscanf / try-int-except)
            F.try_element_at("p", F.lit(1)).try_cast("long").alias("src"),
            F.try_element_at("p", F.lit(2)).try_cast("long").alias("dst"),
        )
    )
    # tolerant parse: drop lines where either field failed the int cast
    return parts.filter(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    )


def write_edge_list(edges: DataFrame, path: str) -> None:
    """Debug sink mirroring the dashboard's temp edge-list writer
    (dashboard/app.py:1502-1508); engine-native persistence is parquet."""
    edges.select(
        F.concat_ws("\t", F.col("src"), F.col("dst")).alias("value")
    ).write.mode("overwrite").text(path)
