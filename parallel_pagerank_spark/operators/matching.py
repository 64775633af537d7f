"""Maximal matching by deterministic local-max edge rounds.

No reference counterpart (SURVEY.md §2 — the reference computes PageRank
only); matching is the other classic parallel symmetry-breaking
primitive next to MIS (Israeli & Itai 1986; Preis 1999 "locally
heaviest" / local-max matching; Birn et al. ESA 2013 show O(log m)
rounds with random priorities). Per round every still-active edge draws
a priority; an edge joins the matching iff its priority is the strict
minimum among all active edges sharing EITHER endpoint; winners'
endpoints retire together with every incident edge.

As in operators/mis.py, the random draw is replaced by the engine's
PORTABLE multiplicative hash over the packed edge key
``u * 2^31 + v`` salted by the round number — deterministic,
bit-identical across engines and partitionings, replayable by a DuckDB
oracle (driver query ``maximal_matching``) and a sequential pure-Python
oracle (pytest parity). Priorities are totalized as the lexicographic
triple ``(bucket, u, v)`` so two incident edges can never both win.

The packed key requires vertex ids < 2^31 (the same bound the MIS
oracle documents); ids at hash magnitude fail fast rather than silently
alias. At 100 TB scale the round is: one explode of active edges to
their two endpoints, one min-struct hash aggregation per endpoint
(map-side partial), one join back, and two anti-joins retiring matched
endpoints — everything keyed on vertex ids, nothing quadratic; eager
localCheckpoint per round truncates lineage (the
operators/pagerank.py:26-31 plan-doubling hazard — the active set is
referenced three times per round).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from ..functions.splits import split_bucket

_ID_BOUND = 2_147_483_648  # 2^31 — packed-key safety bound


@dataclass
class MatchingResult:
    pairs: DataFrame  # (u: long, v: long) with u < v — the matching
    rounds: int
    converged: bool  # False iff max_iter hit with edges still active
    metrics: list[dict] = field(default_factory=list)


def maximal_matching(
    edges: DataFrame,
    max_iter: int = 32,
    salt: int = 0,
    num_partitions: int | None = None,
) -> MatchingResult:
    """Maximal matching over the undirected simple graph of
    ``edges(src, dst)``.

    Direction and multiplicity are irrelevant — edges are canonicalized
    to ``u < v`` and deduped; self-loops are dropped (a vertex cannot
    match itself).
    """
    spark = edges.sparkSession
    num_parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    u = F.least("src", "dst")
    v = F.greatest("src", "dst")
    active = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(u.alias("u"), v.alias("v"))
        .distinct()
        .repartition(num_parts, "u")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bad = active.filter(
        (F.col("u") < 0) | (F.col("v") >= F.lit(_ID_BOUND))
    ).limit(1).count()
    if bad:
        raise ValueError(
            "maximal_matching packed priorities need vertex ids in "
            f"[0, 2^31); got ids outside — remap to dense ids first"
        )
    n_active = active.count()
    matched = spark.createDataFrame([], "u long, v long")
    metrics: list[dict] = [{"round": 0, "active": n_active, "won": 0}]
    rounds = 0
    converged = n_active == 0
    while rounds < max_iter and n_active > 0:
        rounds += 1
        keyed = active.select(
            "u",
            "v",
            split_bucket(
                F.col("u") * F.lit(_ID_BOUND) + F.col("v"),
                salt=salt + rounds,
            ).alias("p"),
        )
        pri = F.struct("p", "u", "v")
        inc = keyed.select(
            F.col("u").alias("ep"), pri.alias("e")
        ).unionByName(keyed.select(F.col("v").alias("ep"), pri.alias("e")))
        mins = inc.groupBy("ep").agg(F.min("e").alias("m"))
        winners = (
            keyed.join(
                mins.select(F.col("ep").alias("u"), F.col("m").alias("mu")),
                "u",
            )
            .join(
                mins.select(F.col("ep").alias("v"), F.col("m").alias("mv")),
                "v",
            )
            .filter((pri == F.col("mu")) & (pri == F.col("mv")))
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        n_won = winners.count()
        taken = (
            winners.select(F.col("u").alias("ep"))
            .unionByName(winners.select(F.col("v").alias("ep")))
            .distinct()
        )
        active = (
            active.join(
                taken.withColumnRenamed("ep", "u"), "u", "left_anti"
            )
            .join(taken.withColumnRenamed("ep", "v"), "v", "left_anti")
            .select("u", "v")
            .repartition(num_parts, "u")
            .localCheckpoint(eager=True)
        )
        n_active = active.count()
        matched = matched.unionByName(winners)
        metrics.append(
            {"round": rounds, "active": n_active, "won": n_won}
        )
        if n_active == 0:
            converged = True
    return MatchingResult(
        matched.localCheckpoint(eager=True), rounds, converged, metrics
    )
