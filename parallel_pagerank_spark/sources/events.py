"""Events-table adapter: the driver testdata's ``events`` table
(event_id, ts, user_id, event_type, value, props) is transcript-shaped
(user_id ~ conv_id, ts-order ~ turn order, event_type ~ tool), so the same
link-derivation semantics as operators/derive.py apply (TESTDATA.md §5
events→graph mapping). Every derivation here is ANSI-SQL-expressible so the
driver's DuckDB oracle can run the identical logic.

Vertex id = event_id (already a dense-ish long key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def reply_edges(events: DataFrame) -> DataFrame:
    """Consecutive events per user under the stable (ts, event_id) order —
    the reply-link analog of derive_edges (E1)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select(
            F.col("event_id").alias("src"),
            F.lead("event_id").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
    )


def handoff_edges(events: DataFrame) -> DataFrame:
    """Consecutive events sharing an event_type, chained across users in
    (ts, event_id) order — the tool-handoff analog."""
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    return (
        events.select(
            F.col("event_id").alias("src"),
            F.lead("event_id").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
    )


def event_graph_edges(events: DataFrame) -> DataFrame:
    """reply ∪ handoff (duplicates kept — multi-edge semantics)."""
    return reply_edges(events).unionByName(handoff_edges(events))


def cooccurrence_edges(events: DataFrame, window: int = 2) -> DataFrame:
    """Canonical (src<dst) co-occurrence pairs: events of the same user at
    session distance <= ``window`` (row_number over the per-user timeline).
    Gives a triangle-rich graph (consecutive triples close wedges); the
    bounded window keeps it linear in input size, never a per-user clique.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pos = events.select(
        "user_id",
        F.col("event_id").alias("id"),
        F.row_number().over(w).alias("pos"),
    )
    a = pos.select("user_id", F.col("id").alias("ia"), F.col("pos").alias("pa"))
    b = pos.select("user_id", F.col("id").alias("ib"), F.col("pos").alias("pb"))
    return (
        a.join(b, "user_id")
        .filter(
            (F.col("pb") > F.col("pa"))
            & (F.col("pb") - F.col("pa") <= window)
        )
        .select(
            F.least("ia", "ib").alias("src"),
            F.greatest("ia", "ib").alias("dst"),
        )
    )
