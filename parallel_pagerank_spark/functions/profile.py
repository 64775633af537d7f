"""Table profiling: per-column completeness/cardinality/range summary.

No reference counterpart (the reference profiles only its graph); this
is the data-quality gate a 100 TB ingest runs before anything else —
null pressure, cardinality, and value ranges per column, as one small
DataFrame.

Scale shape: ONE pass over the table computing every column's aggregates
in a single wide aggregation (Spark evaluates all of them in one
scan — no per-column jobs), then a constant-size driver-side pivot to
long form (|columns| rows). count(DISTINCT) for several columns in one
aggregation is planned by Spark as an expand + two-level aggregate —
still one scan of the input; for columns where an approximation
suffices at extreme scale, ``approx=True`` swaps in HLL++
(approx_count_distinct), trading oracle-exactness for a single-level
aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_table(df: DataFrame, approx: bool = False) -> DataFrame:
    """Per-column profile: ``(column, n_rows, n_null, n_distinct,
    min_str, max_str)``. min/max are computed in the column's native
    type (so numeric columns order numerically) and then rendered as
    strings so every column fits one output schema. Complex-typed
    columns (arrays/structs/maps) report nulls and distincts only
    (min/max NULL — no portable ordering)."""
    distinct_fn = F.approx_count_distinct if approx else F.countDistinct
    simple = {
        f.name: not f.dataType.typeName()
        in ("array", "map", "struct", "binary")
        for f in df.schema.fields
    }
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c, is_simple in simple.items():
        aggs.append(F.count(c).alias(f"{c}__nn"))
        aggs.append(distinct_fn(c).alias(f"{c}__nd"))
        if is_simple:
            aggs.append(F.min(c).cast("string").alias(f"{c}__min"))
            aggs.append(F.max(c).cast("string").alias(f"{c}__max"))
    wide = df.agg(*aggs)
    cols = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"{c}__nn")).alias("n_null"),
            F.col(f"{c}__nd").alias("n_distinct"),
            (
                F.col(f"{c}__min") if is_simple else F.lit(None).cast("string")
            ).alias("min_str"),
            (
                F.col(f"{c}__max") if is_simple else F.lit(None).cast("string")
            ).alias("max_str"),
        )
        for c, is_simple in simple.items()
    ]
    return wide.select(
        F.explode(F.array(*cols)).alias("p")
    ).select("p.*")


def column_quantiles(
    df: DataFrame,
    col: str,
    probabilities: tuple[float, ...] = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99),
) -> DataFrame:
    """Exact interpolated quantiles of a numeric column, one row with a
    ``qXX`` double column per probability. Spark's exact ``percentile``
    and DuckDB's ``quantile_cont`` share the linear-interpolation
    definition, so results are bit-identical and the driver oracle
    hash-matches. Exact percentile sorts within each aggregation buffer;
    at the 100 TB scale prefer ``approx_percentile`` (KLL-sketch-style
    mergeable summaries, no global sort) — exact quantiles are the
    profiler/validation tier."""
    aggs = [
        F.percentile(col, F.lit(p)).alias(f"q{str(p)[2:]}")
        for p in probabilities
    ]
    return df.agg(*aggs)


def percentile_filter(
    df: DataFrame,
    score_col,
    strata_col: str,
    min_percentile: float,
    id_col: str = "doc_id",
    approx: bool = False,
) -> DataFrame:
    """Keep rows at or above a per-stratum score percentile — the
    standard quality-cutoff stage of a corpus pipeline ("drop the
    bottom quartile per language" — cutoffs computed within each
    stratum so a low-resource language is not wiped out by a
    high-resource one's score distribution).

    ``score_col`` may be a column name or a Column expression (e.g.
    ``text.quality_score("text")``). Adds a ``pct`` column
    (``percent_rank`` ∈ [0, 1], ties broken by ``id_col`` so the rank
    is total and engine-portable) and keeps rows with
    ``pct >= min_percentile``. A singleton stratum has pct 0 —
    kept only when min_percentile is 0.

    Two tiers:

    - exact (default): one window sort per stratum. The shuffle is
      keyed on the stratum alone, so a giant stratum serializes into
      one task — correct, and what the driver's DuckDB oracle mirrors,
      but a sort of the full 100 TB stratum.
    - ``approx=True``: the scale path — per-stratum cutoff from
      ``approx_percentile`` (one aggregation), broadcast back and
      filtered. Two scans, no total sort, no skew hazard; membership
      near the cutoff can differ from exact by the sketch's rank error
      (no ``pct`` column is produced).
    """
    if not 0.0 <= min_percentile <= 1.0:
        raise ValueError(
            f"min_percentile must be in [0, 1], got {min_percentile}"
        )
    score = F.col(score_col) if isinstance(score_col, str) else score_col
    scored = df.withColumn("__score", score)
    if approx:
        cuts = scored.groupBy(strata_col).agg(
            F.percentile_approx("__score", min_percentile).alias("__cut")
        )
        return (
            scored.join(F.broadcast(cuts), strata_col)
            .filter(F.col("__score") >= F.col("__cut"))
            .drop("__cut")
            .withColumnRenamed("__score", "score")
        )
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy("__score", id_col)
    return (
        scored.withColumn("pct", F.percent_rank().over(w))
        .filter(F.col("pct") >= F.lit(min_percentile))
        .withColumnRenamed("__score", "score")
    )


def distribution_drift(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Population Stability Index terms between two slices of a numeric
    column — the standard train/serve (or train/test) drift check: has
    the distribution of ``value_col`` shifted between snapshot ``a``
    and snapshot ``b``? PSI = Σ_i (p_i − q_i)·ln(p_i/q_i); rule of
    thumb: < 0.1 stable, 0.1–0.25 moderate, > 0.25 shifted.

    Buckets are EQUAL-WIDTH integer ranges over the combined min..max,
    computed with TRUE integer division (``(v − min)·B div (max − min
    + 1)``, SQL ``div`` / DuckDB ``//``) and clamped to ``B − 1`` — so
    the bucketing is bit-identical on any engine that mirrors the same
    int64 expression, with no float boundaries. (The clamp is a guard
    against int64 overflow of ``(v − min)·B`` on pathological ranges;
    within-range inputs never produce bucket == B under integer
    division.) Proportions are Laplace-smoothed
    ((c + 0.5) / (n + B/2)) so empty buckets contribute finite terms.
    Returns one row per bucket: ``(bucket, a_n, b_n, psi_term)`` —
    Σ psi_term is the PSI, left to the caller so every emitted float is
    a single per-bucket expression (engine-portable; no cross-row sum
    order). Rows with NULL values are excluded from both slices.

    Scale shape: two scalar aggs for the global bounds (one scan each),
    then one hash aggregation per slice keyed on the bucket — the 100
    TB cost is two column scans.
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    both = a.select(F.col(value_col).alias("v")).unionByName(
        b.select(F.col(value_col).alias("v"))
    ).filter(F.col("v").isNotNull())
    row = both.agg(
        F.min("v").cast("long").alias("lo"),
        F.max("v").cast("long").alias("hi"),
    ).first()
    lo, hi = row["lo"], row["hi"]
    if lo is None:
        raise ValueError("no non-null values to compare")
    span = hi - lo + 1

    def bucketed(df: DataFrame, name: str) -> DataFrame:
        num = (F.col(value_col).cast("long") - F.lit(lo)) * F.lit(
            n_buckets
        )
        return (
            df.filter(F.col(value_col).isNotNull())
            .select(num.alias("__num"))
            .select(
                F.least(
                    F.expr(f"__num div {span}"),
                    F.lit(n_buckets - 1).cast("long"),
                ).alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count("*").alias(name))
        )

    spark = a.sparkSession
    buckets = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    an = a.filter(F.col(value_col).isNotNull()).count()
    bn = b.filter(F.col(value_col).isNotNull()).count()
    joined = (
        buckets.join(bucketed(a, "a_n"), "bucket", "left")
        .join(bucketed(b, "b_n"), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("a_n", F.lit(0)).alias("a_n"),
            F.coalesce("b_n", F.lit(0)).alias("b_n"),
        )
    )
    p = (F.col("a_n") + F.lit(0.5)) / F.lit(an + 0.5 * n_buckets)
    q = (F.col("b_n") + F.lit(0.5)) / F.lit(bn + 0.5 * n_buckets)
    return joined.select(
        "bucket", "a_n", "b_n", ((p - q) * F.log(p / q)).alias("psi_term")
    )


def hot_keys(df: DataFrame, key_col: str, k: int = 20) -> DataFrame:
    """Top-``k`` heaviest values of ``key_col`` by exact row count →
    ``(key_col, n, share)`` — the skew diagnostic read BEFORE choosing a
    join/agg strategy (the north rule's salted-repartitioning and the
    linkanalysis degree caps all need to know which keys are hot; at
    100 TB you measure skew, you don't guess it).

    One scan: a two-phase hash aggregation keyed on the value (map-side
    partial counts, so the hot key itself never ships raw rows) plus a
    broadcast 1-row total, then a TakeOrderedAndProject top-k (per-
    partition heap — no full sort). Ties at the cut break by smallest
    key, so the returned SET is deterministic. ``share`` = n/total as a
    single IEEE division of exact int64 counts (engine-portable
    bit-for-bit); nulls count as a key like any other.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    total = df.agg(F.count(F.lit(1)).alias("__tot"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            key_col,
            "n",
            F.round(F.col("n") / F.col("__tot"), 9).alias("share"),
        )
        .orderBy(F.desc("n"), F.asc(key_col))
        .limit(k)
    )
