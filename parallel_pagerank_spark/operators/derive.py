"""Transcript → link-graph derivation (SURVEY.md §2 E1/E2).

No reference counterpart (the reference reads edge lists directly); mandated
by the north rule: conversation/agent transcripts become a directed edge
table of

- reply links: turn i → turn i+1 within a conversation under the stable
  ``(conv_id, turn_idx)`` total order (lead window — the Spark-native form of
  a consecutive-turn self-join), and
- tool-handoff links: consecutive turns invoking the same non-null ``tool``,
  chained in ``(ts, conv_id, turn_idx)`` order across conversations (so a
  shared tool forms a hub-ish path through the graph rather than a quadratic
  all-pairs clique).

Vertex-id assignment:
- ``id_mode="hash"``  — ``xxhash64(conv_id, turn_idx)``: stateless and
  scale-free (no global coordination); collision probability is the usual
  64-bit birthday bound, acceptable up to ~10^8 turns per graph; use dense
  mode beyond that or when the dense 0..N-1 id space is required.
- ``id_mode="dense"`` — deterministic dense ids 0..N-1 in ``(conv_id,
  turn_idx)`` order: per-conversation offsets via a cumulative sum over the
  (much smaller) per-conversation turn counts, then offset + local
  row_number. The only global window runs over one row per conversation.

Invariant (input_hint): per-turn ``text`` equality under stable ordering —
derivation never mutates, drops, or reorders the transcript rows; tests
round-trip check it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def turn_vertices(transcripts: DataFrame, id_mode: str = "hash") -> DataFrame:
    """``(id, conv_id, turn_idx)`` — one vertex per turn."""
    if id_mode == "hash":
        return transcripts.select(
            F.xxhash64("conv_id", "turn_idx").alias("id"),
            "conv_id",
            "turn_idx",
        )
    if id_mode == "dense":
        counts = transcripts.groupBy("conv_id").agg(
            F.count("*").alias("n_turns")
        )
        off_w = (
            Window.orderBy("conv_id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offsets = counts.select(
            "conv_id",
            F.coalesce(F.sum("n_turns").over(off_w), F.lit(0)).alias(
                "offset"
            ),
        )
        local_w = Window.partitionBy("conv_id").orderBy("turn_idx")
        return (
            transcripts.join(offsets, "conv_id")
            .select(
                (
                    F.col("offset")
                    + F.row_number().over(local_w)
                    - F.lit(1)
                ).alias("id"),
                "conv_id",
                "turn_idx",
            )
        )
    raise ValueError(f"unknown id_mode: {id_mode}")


def derive_edges(
    transcripts: DataFrame,
    id_mode: str = "hash",
    reply_links: bool = True,
    handoff_links: bool = True,
) -> DataFrame:
    """→ ``edges(src: long, dst: long)`` (duplicates kept: a turn pair linked
    by both a reply and a handoff contributes twice, matching the reference's
    multi-edge semantics, csr_graph.c:19-23)."""
    with_ids = transcripts.join(
        turn_vertices(transcripts, id_mode),
        on=["conv_id", "turn_idx"],
        how="inner",
    )
    parts = []
    if reply_links:
        w = Window.partitionBy("conv_id").orderBy("turn_idx")
        parts.append(
            with_ids.select(
                F.col("id").alias("src"),
                F.lead("id").over(w).alias("dst"),
            ).filter(F.col("dst").isNotNull())
        )
    if handoff_links:
        w = Window.partitionBy("tool").orderBy("ts", "conv_id", "turn_idx")
        parts.append(
            with_ids.filter(F.col("tool").isNotNull())
            .select(
                "tool",
                F.col("id").alias("src"),
                F.lead("id").over(w).alias("dst"),
            )
            .filter(F.col("dst").isNotNull())
            .select("src", "dst")
        )
    if not parts:
        raise ValueError("at least one link type must be enabled")
    edges = parts[0]
    for p in parts[1:]:
        edges = edges.unionByName(p)
    return edges
