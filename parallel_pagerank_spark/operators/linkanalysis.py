"""Co-citation and bibliographic coupling (classic link-analysis pairs).

No reference counterpart; standard link-graph measures from the public
literature (Small 1973 co-citation; Kessler 1963 bibliographic coupling —
the two similarity matrices HITS/SALSA factor through, cf. Lempel &
Moran WWW'00): two pages are *co-cited* with strength k when k pages
link to both; two pages are *coupled* with strength k when both link to
the same k pages.

Scale design: the pair enumeration is a self-join of the edge list on
the shared endpoint — per shared vertex it emits C(deg, 2) pairs, so an
unbounded hub would explode quadratically (the exact hazard the round-2
review flagged in the old co-occurrence derivation). The standard public
mitigation is an explicit frequency/degree cap (as in word-co-occurrence
mining): vertices whose relevant degree exceeds ``degree_cap`` are
excluded from pair generation *and the exclusion is reported*, making
worst-case work O(V · degree_cap²) regardless of skew. A hub that links
to everything co-cites everything and carries no signal anyway — same
rationale as stop-word removal.

Shuffle shape: dedupe edges (one shuffle on (key, item)), one groupBy
for the cap degrees, one self-join shuffled on the shared key, one
groupBy on the pair. All exchanges are keyed on hashed longs; no arrays,
no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def common_neighbor_pairs(
    edges: DataFrame,
    mode: str = "cocitation",
    degree_cap: int = 1000,
    min_common: int = 1,
) -> DataFrame:
    """→ (u, v, n_common) with u < v.

    mode="cocitation": u, v share n_common in-neighbors (pages citing
    both). mode="coupling": u, v share n_common out-neighbors (pages
    both cite). Duplicate edges and self-loops are ignored; shared
    endpoints with more than ``degree_cap`` distinct neighbors are
    excluded from pair generation (see module docstring); pairs below
    ``min_common`` are dropped.
    """
    if mode == "cocitation":
        # shared endpoint = the citing page (src); items = its targets
        kv = edges.select(F.col("src").alias("k"), F.col("dst").alias("x"))
    elif mode == "coupling":
        # shared endpoint = the cited page (dst); items = its citers
        kv = edges.select(F.col("dst").alias("k"), F.col("src").alias("x"))
    else:
        raise ValueError(f"mode must be cocitation|coupling, got {mode!r}")
    kv = kv.where(F.col("k") != F.col("x")).distinct()
    deg = kv.groupBy("k").agg(F.count("*").alias("k_deg"))
    kept = kv.join(
        deg.where(F.col("k_deg") <= degree_cap).select("k"), "k"
    )
    a = kept.select("k", F.col("x").alias("u"))
    b = kept.select("k", F.col("x").alias("v"))
    pairs = (
        a.join(b, "k")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("n_common"))
    )
    if min_common > 1:
        pairs = pairs.where(F.col("n_common") >= min_common)
    return pairs


def excluded_hubs(
    edges: DataFrame, mode: str = "cocitation", degree_cap: int = 1000
) -> DataFrame:
    """→ (k, k_deg): the shared endpoints ``common_neighbor_pairs``
    excluded under ``degree_cap`` — report alongside the pairs so a
    capped run never silently claims full coverage."""
    col = "src" if mode == "cocitation" else "dst"
    other = "dst" if mode == "cocitation" else "src"
    kv = (
        edges.select(F.col(col).alias("k"), F.col(other).alias("x"))
        .where(F.col("k") != F.col("x"))
        .distinct()
    )
    return (
        kv.groupBy("k")
        .agg(F.count("*").alias("k_deg"))
        .where(F.col("k_deg") > degree_cap)
    )


def adamic_adar(
    edges: DataFrame,
    degree_cap: int = 1000,
    weight: str = "adamic_adar",
    exclude_existing: bool = True,
) -> DataFrame:
    """→ (u, v, n_common, score) with u < v: neighborhood-overlap link
    prediction (Liben-Nowell & Kleinberg CIKM'03; Adamic & Adar '03;
    resource allocation: Zhou et al. EPJ B '09).

    The graph is treated as UNDIRECTED: N(k) is the set of distinct
    neighbors of k in either direction (self-loops and duplicate edges
    ignored). For every candidate pair (u, v) the score sums over their
    common neighbors k:

    - weight="adamic_adar":          Σ 1 / ln(deg(k))
    - weight="resource_allocation":  Σ 1 / deg(k)
    - weight="common":               Σ 1            (plain CN count)

    A common neighbor has deg(k) ≥ 2 by construction, and degree-1
    vertices are filtered BEFORE the weight projection — the weight
    expression is evaluated per (k, x) row ahead of the pair join, so
    without that filter a degree-1 leaf would hit 1/ln(1) and ANSI
    mode would abort the whole job (caught by the sf0.001 bench, where
    the event graph has leaves). ``exclude_existing=True`` keeps only
    pairs NOT already connected (the link-prediction setting proper);
    False scores adjacent pairs too (the similarity-matrix setting).

    Scale design: identical to ``common_neighbor_pairs`` — pair
    generation through the shared neighbor k costs C(deg(k), 2), so
    hubs above ``degree_cap`` are excluded from generation (report them
    with ``excluded_hubs_undirected``); worst case O(V · cap²)
    regardless of skew. Shuffles: one distinct on (k, x), one degree
    agg, one self-join on k, one pair agg, plus (when excluding) one
    left-anti shuffle on the pair key. All long-keyed, no UDFs.
    """
    if weight not in ("adamic_adar", "resource_allocation", "common"):
        raise ValueError(
            "weight must be adamic_adar|resource_allocation|common, "
            f"got {weight!r}"
        )
    nbr = (
        edges.select(F.col("src").alias("k"), F.col("dst").alias("x"))
        .union(edges.select(F.col("dst").alias("k"), F.col("src").alias("x")))
        .where(F.col("k") != F.col("x"))
        .distinct()
    )
    deg = nbr.groupBy("k").agg(F.count("*").alias("k_deg"))
    kept = nbr.join(
        deg.where(
            (F.col("k_deg") <= degree_cap) & (F.col("k_deg") >= 2)
        ),
        "k",
    )
    if weight == "adamic_adar":
        w = F.lit(1.0) / F.log(F.col("k_deg").cast("double"))
    elif weight == "resource_allocation":
        w = F.lit(1.0) / F.col("k_deg").cast("double")
    else:
        w = F.lit(1.0)
    a = kept.select("k", F.col("x").alias("u"), w.alias("w"))
    b = kept.select("k", F.col("x").alias("v"))
    pairs = (
        a.join(b, "k")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(
            F.count("*").alias("n_common"),
            F.sum("w").alias("score"),
        )
    )
    if exclude_existing:
        und = edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        ).where(F.col("u") != F.col("v")).distinct()
        pairs = pairs.join(und, ["u", "v"], "left_anti")
    return pairs


def jaccard_linkpred(
    edges: DataFrame,
    degree_cap: int = 1000,
    min_common: int = 1,
    exclude_existing: bool = True,
) -> DataFrame:
    """→ (u, v, n_common, jaccard) with u < v: neighborhood-Jaccard
    link prediction (Liben-Nowell & Kleinberg CIKM'03's Jaccard
    predictor) — J(u, v) = |N(u) ∩ N(v)| / |N(u) ∪ N(v)| over the
    undirected distinct neighborhoods (self-loops and duplicate edges
    ignored), computed as n_common / (deg(u) + deg(v) − n_common).

    Compared with :func:`adamic_adar` this normalizes by neighborhood
    SIZE, so two low-degree vertices sharing most of their few
    neighbors outrank two hubs sharing many — the set-overlap analogue
    of the n-gram Jaccard used for document dedup, applied to the link
    graph. ``exclude_existing=True`` keeps only non-adjacent pairs
    (the prediction setting proper).

    Scale design: pair generation is the same hub-capped self-join
    through the shared neighbor k as :func:`common_neighbor_pairs`
    (report exclusions via :func:`excluded_hubs_undirected`; worst case
    O(V · cap²) under any skew). Denominator degrees are the TRUE
    uncapped degrees — with hubs excluded from generation, n_common is
    a lower bound and so is the score (documented cap semantics, never
    an overcount). The score is a single IEEE division of exact
    integers — bit-reproducible across engines. Shuffles: one distinct
    on (k, x), one degree agg, one self-join on k, one pair agg, two
    vertex-keyed degree joins, plus one anti-join when excluding.
    """
    if min_common < 1:
        raise ValueError(f"min_common must be >= 1, got {min_common}")
    nbr = (
        edges.select(F.col("src").alias("k"), F.col("dst").alias("x"))
        .union(edges.select(F.col("dst").alias("k"), F.col("src").alias("x")))
        .where(F.col("k") != F.col("x"))
        .distinct()
    )
    # true (uncapped) undirected degree of every vertex, keyed by x for
    # the denominator joins: deg(x) = # rows where x is the neighbor
    # owner — i.e. group nbr by the OWNER side k, then rename.
    deg = nbr.groupBy("k").agg(F.count("*").alias("deg"))
    kept = nbr.join(
        deg.where(F.col("deg") <= degree_cap).select("k"), "k"
    )
    a = kept.select("k", F.col("x").alias("u"))
    b = kept.select("k", F.col("x").alias("v"))
    pairs = (
        a.join(b, "k")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("n_common"))
        .where(F.col("n_common") >= min_common)
    )
    du = deg.select(F.col("k").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("k").alias("v"), F.col("deg").alias("dv"))
    scored = (
        pairs.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("du") + F.col("dv") - F.col("n_common")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
    )
    if exclude_existing:
        und = edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        ).where(F.col("u") != F.col("v")).distinct()
        scored = scored.join(und, ["u", "v"], "left_anti")
    return scored


def excluded_hubs_undirected(
    edges: DataFrame, degree_cap: int = 1000
) -> DataFrame:
    """→ (k, k_deg): vertices ``adamic_adar`` excluded under
    ``degree_cap`` (undirected distinct degree) — report alongside the
    scores so a capped run never silently claims full coverage."""
    nbr = (
        edges.select(F.col("src").alias("k"), F.col("dst").alias("x"))
        .union(edges.select(F.col("dst").alias("k"), F.col("src").alias("x")))
        .where(F.col("k") != F.col("x"))
        .distinct()
    )
    return (
        nbr.groupBy("k")
        .agg(F.count("*").alias("k_deg"))
        .where(F.col("k_deg") > degree_cap)
    )
