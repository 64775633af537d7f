"""Train/eval n-gram decontamination for corpus pipelines.

No reference counterpart (the reference is a numeric PageRank engine —
see SURVEY.md §2); this is the standard published benchmark-leakage
check a training-data pipeline runs before every release: flag any
training document that shares at least one word n-gram with any
evaluation document, so eval-set text cannot leak into the training mix
(the n-gram-overlap decontamination procedure described in the GPT-3,
PaLM, and Llama papers; production filters use n = 8..13 — tests here
use smaller n because fixture docs are short).

Scale shape (the part that matters at 100 TB):

- each side is reduced to its DISTINCT per-doc n-gram set JVM-side
  (``split`` → ``transform(sequence(...))`` higher-order functions —
  no explode until after the per-doc dedup, no Python),
- the only shuffle is the equi-join on the n-gram key; with
  ``key="hash64"`` the key is a 64-bit ``xxhash64`` so shuffle rows are
  fixed-width instead of carrying full n-gram strings (the same
  fingerprint-not-text rule as ``functions/dedup.exact_dedup``),
- the train side is typically 10^4× the eval side, so the grams of the
  EVAL side are broadcast when small enough — Catalyst/AQE picks this
  up from statistics; the join is written eval-last to keep that form.

``key="text"`` joins on the raw n-gram string — bit-portable to any SQL
engine, which is what the driver's DuckDB oracle checks; ``"hash64"``
is the fixed-width scale tier (identical output short of an xxhash64
collision between distinct n-grams, ~2^-64 per pair).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import normalized_text


def ngram_set(text_col: Column, n: int) -> Column:
    """DISTINCT word n-grams of the normalized text, as an array column.

    Tokens are the engine-wide whitespace normalization's words; a doc
    with fewer than ``n`` tokens has an empty set. Pure higher-order
    Column expressions (whole-stage codegen, no shuffle, no Python).
    """
    toks = F.filter(
        F.split(normalized_text(text_col), " "), lambda w: w != F.lit("")
    )
    m = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), m - F.lit(n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(m >= F.lit(n), F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def ngram_contamination(
    train: DataFrame,
    test: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    key: str = "text",
) -> DataFrame:
    """Training docs sharing ≥1 word n-gram with any evaluation doc.

    Returns one row per CONTAMINATED training document:
    ``(doc_id, n_shared, n_test_docs, first_test_doc)`` where
    ``n_shared`` counts distinct leaked n-grams, ``n_test_docs`` counts
    distinct eval docs hit, and ``first_test_doc`` (min eval id) gives
    a reproducible example for auditing. Training docs with no overlap
    are absent (the common case — anti-join them against this output to
    get the clean set).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if key not in ("text", "hash64"):
        raise ValueError(f"key must be 'text' or 'hash64', got {key!r}")

    def grams_of(df: DataFrame, out_id: str) -> DataFrame:
        g = df.select(
            F.col(id_col).alias(out_id),
            F.explode(ngram_set(F.col(text_col), n)).alias("gram"),
        )
        if key == "hash64":
            g = g.select(out_id, F.xxhash64("gram").alias("gram"))
        return g

    tr = grams_of(train, "doc_id")
    te = grams_of(test, "test_doc")
    return (
        tr.join(te, "gram")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gram").alias("n_shared"),
            F.countDistinct("test_doc").alias("n_test_docs"),
            F.min("test_doc").alias("first_test_doc"),
        )
    )


def ngram_containment(
    train: DataFrame,
    test: DataFrame,
    n: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    key: str = "text",
) -> DataFrame:
    """Eval-side contamination score: per TEST document, the fraction of
    its distinct word n-grams that appear anywhere in the training set.

    This is the published "containment" metric (the GPT-4/Llama-style
    dirty-doc rule flags an eval doc when containment exceeds a
    threshold like 0.8) — the complement of :func:`ngram_contamination`,
    which reports per-TRAIN-doc leaks. Returns one row per test doc:
    ``(doc_id, n_grams, n_hit, containment)`` with containment =
    n_hit / n_grams (0.0 for docs too short to have any n-gram, by
    convention). Exact integer counts and a single IEEE division —
    engine-portable without float tolerance.

    Scale shape: the train side collapses to its DISTINCT gram set
    before the join (one aggregation keyed on the gram), the join is a
    LEFT SEMI against that set (no fan-out on hot grams — a gram
    appearing in 10^6 train docs contributes one row), then one count
    keyed by test doc. Same ``key`` tiers as ngram_contamination.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if key not in ("text", "hash64"):
        raise ValueError(f"key must be 'text' or 'hash64', got {key!r}")

    def grams_of(df: DataFrame) -> DataFrame:
        g = df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(ngram_set(F.col(text_col), n)).alias("gram"),
        )
        if key == "hash64":
            g = g.select("doc_id", F.xxhash64("gram").alias("gram"))
        return g

    te = grams_of(test)
    tr_set = grams_of(train).select("gram").distinct()
    hits = (
        te.join(tr_set, "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit"))
    )
    totals = te.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    base = test.select(F.col(id_col).alias("doc_id"))
    return (
        base.join(totals, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            F.when(
                F.coalesce("n_grams", F.lit(0)) > 0,
                F.coalesce("n_hit", F.lit(0)).cast("double")
                / F.col("n_grams").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("containment"),
        )
    )


def leakage_safe_split(
    docs: DataFrame,
    threshold: float = 0.9,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    splits=None,
    salt: int = 0,
) -> DataFrame:
    """Dataset split that near-duplicates can never straddle.

    Plain per-doc splitting (functions/splits.assign_split) leaks: two
    near-duplicate documents hash independently, so one can land in
    train and its twin in test — exactly the contamination
    :func:`ngram_contamination` later flags. This composes the two
    existing primitives so the leak cannot happen by construction:

    1. near-dup CLUSTERS (functions/dedup.near_dup_clusters — exact
       Jaccard pairs → connected components, cluster_id = min doc id),
    2. every document splits on its ``anchor`` = cluster_id (own id
       when unclustered), so a whole cluster moves as one unit.

    Returns the input columns plus ``anchor`` and ``split``. Properties
    inherited from the portable hash: deterministic on any cluster,
    monotone split growth, salt re-deal — now at cluster granularity.

    Scale shape: the clustering is the prefix-filtered Jaccard join +
    pair-graph components (both bucketed — no all-pairs work); the
    anchor join keys on the doc id; the split itself stays a pure
    Column expression.
    """
    from .dedup import near_dup_clusters
    from .splits import DEFAULT_SPLITS, assign_split

    clusters = near_dup_clusters(docs, threshold, id_col, text_col, n)
    # near_dup_clusters already names its id column `id_col` — selecting it
    # by that name keeps non-default id_col values working.
    anchored = docs.join(
        clusters.select(F.col(id_col), F.col("cluster_id")),
        id_col,
        "left",
    ).withColumn(
        "anchor", F.coalesce(F.col("cluster_id"), F.col(id_col))
    ).drop("cluster_id")
    return assign_split(
        anchored,
        id_col="anchor",
        splits=splits or DEFAULT_SPLITS,
        salt=salt,
    )
