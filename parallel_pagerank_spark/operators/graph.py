"""Core graph-model DataFrames: vertices, degrees, edge normalizations.

The reference keeps the graph as an in-memory CSR struct
(/root/reference/pagerank_mpi/csr_graph.h:15-20). The Spark-native form is a
flat ``edges(src: long, dst: long)`` DataFrame; duplicates are KEPT — the
reference counts every input line (csr_graph.c:19-23), so a multi-edge
contributes its multiplicity to out-degree and rank flow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def vertices_from_edges(edges: DataFrame) -> DataFrame:
    """Dense vertex set ``0..max_id`` (csr_graph.c:27: num_nodes = max_id+1).

    Ids that appear in no edge but are < max_id still exist and hold rank.
    Uses ``spark.range`` — generated, never materialized from the edge table.
    """
    row = edges.agg(
        F.greatest(F.max("src"), F.max("dst")).alias("max_id")
    ).first()
    max_id = row["max_id"]
    n = (max_id + 1) if max_id is not None else 0
    return edges.sparkSession.range(n).withColumnRenamed("id", "id")


def out_degrees(edges: DataFrame) -> DataFrame:
    """``(id, out_deg)`` — CSR row length (pagerank_mpi.c:179). Vertices with
    no out-edges are absent (⇒ dangling, pagerank_mpi.c:169)."""
    return edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("out_deg")
    )


def in_degrees(edges: DataFrame) -> DataFrame:
    """``(id, in_deg)`` (dashboard/app.py:464)."""
    return edges.groupBy(F.col("dst").alias("id")).agg(
        F.count("*").alias("in_deg")
    )


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected view for CC / label propagation: both directions, self-loops
    dropped, duplicates removed. Distinct is required so LPA neighbor-label
    frequencies count each neighbor once."""
    fwd = edges.select("src", "dst")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return fwd.unionByName(rev).filter(F.col("src") != F.col("dst")).distinct()


def canonical_edges(edges: DataFrame) -> DataFrame:
    """Canonical undirected simple edges ``(u < v)`` — the triangle-count
    input (SURVEY.md §2 E5): orient low→high, dedupe, drop self-loops."""
    return (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
    )
