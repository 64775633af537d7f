"""Deterministic train/validation/test assignment for corpus pipelines.

No reference counterpart (the reference is a numeric PageRank engine);
this is the standard reproducible-split primitive a 100 TB training-data
pipeline needs: every row is assigned to a named split purely as a
function of its id (and an optional salt), so the assignment is stable
across runs, machines, re-partitioning, and engine versions — and a
different salt re-deals the whole split without touching the data.

Two hash tiers:

- ``method="portable"`` (default): a Knuth multiplicative hash computed
  entirely in int64 arithmetic whose every intermediate stays below
  2^62, so Spark, DuckDB, and numpy produce bit-identical buckets —
  this is what the driver's DuckDB oracle checks. The id is first
  reduced mod a prime so the product cannot overflow for any int64 id.
- ``method="xxhash64"``: Spark's built-in xxhash64 for adversarial /
  structured id spaces (sequential ids are fine under the portable
  hash; ids that are themselves multiples of large powers of two are
  not). Not SQL-portable, hence not the oracle path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Knuth's multiplicative constant (2^32 * golden ratio) and a Mersenne-31
# prime reduction: ((id mod P) * K) mod 2^32 — max intermediate
# (P-1) * K < 2^31 * 2^32 = 2^63, exact in int64 everywhere.
_P = 2_147_483_647  # 2^31 - 1
_K = 2_654_435_761
_M = 4_294_967_296  # 2^32

DEFAULT_SPLITS = (("train", 0.9), ("valid", 0.05), ("test", 0.05))


def split_bucket(
    id_col: Column, salt: int = 0, method: str = "portable"
) -> Column:
    """Uniform bucket in [0, 2^32) as a deterministic function of the id."""
    if method == "xxhash64":
        return F.pmod(F.xxhash64(id_col, F.lit(salt)), F.lit(_M))
    if method != "portable":
        raise ValueError(f"unknown split hash method: {method!r}")
    reduced = F.pmod(id_col.cast("long") + F.lit(salt), F.lit(_P))
    return F.pmod(reduced * F.lit(_K), F.lit(_M))


def split_bucket_sql(id_expr: str, salt: int = 0) -> str:
    """The portable bucket as ANSI SQL (DuckDB oracle mirror)."""
    return (
        f"(((({id_expr})::BIGINT + {salt}) % {_P} + {_P}) % {_P}"
        f" * {_K}) % {_M}"
    )


def _sql_str(name: str) -> str:
    """A string literal safe to interpolate into generated SQL
    (single quotes doubled per ANSI)."""
    return "'" + name.replace("'", "''") + "'"


def assign_split(
    df: DataFrame,
    id_col: str = "doc_id",
    splits: tuple[tuple[str, float], ...] = DEFAULT_SPLITS,
    salt: int = 0,
    method: str = "portable",
) -> DataFrame:
    """Add a ``split`` column assigning each row to a named fraction.

    ``splits`` is an ordered (name, fraction) tuple summing to 1.0; the
    bucket space [0, 2^32) is carved into contiguous integer ranges in
    that order, so enlarging an early split keeps every row it already
    owned (monotone split growth — rows only ever move OUT of later
    splits). Pure Column arithmetic: no shuffle, no Python, survives
    any partitioning.
    """
    total = sum(f for _, f in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1.0, got {total}")
    bucket = split_bucket(F.col(id_col), salt=salt, method=method)
    bounds: list[tuple[str, int]] = []
    acc = 0.0
    for name, frac in splits[:-1]:
        acc += frac
        bounds.append((name, int(acc * _M)))
    expr: Column = F.lit(splits[-1][0])
    for name, ub in reversed(bounds):
        expr = F.when(bucket < F.lit(ub), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def split_case_sql(
    id_expr: str,
    splits: tuple[tuple[str, float], ...] = DEFAULT_SPLITS,
    salt: int = 0,
) -> str:
    """CASE expression mirroring :func:`assign_split` for the oracle."""
    bucket = split_bucket_sql(id_expr, salt=salt)
    acc = 0.0
    arms = []
    for name, frac in splits[:-1]:
        acc += frac
        arms.append(
            f"WHEN {bucket} < {int(acc * _M)} THEN {_sql_str(name)}"
        )
    if not arms:
        return _sql_str(splits[-1][0])
    return (
        "CASE " + " ".join(arms)
        + f" ELSE {_sql_str(splits[-1][0])} END"
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: int = 0,
    method: str = "portable",
) -> DataFrame:
    """Deterministic per-stratum downsampling (quality-tiered corpus mix).

    Keeps a row iff its :func:`split_bucket` falls below ``rate * 2^32``
    for the rate of its stratum — the standard reproducible alternative
    to ``df.sampleBy`` (whose Bernoulli draw depends on partitioning and
    seed plumbing): membership here is a pure function of (id, salt), so
    the same row set is produced on any cluster, engine version, or
    re-partitioning, and growing a stratum's rate only ever ADDS rows
    (monotone, like :func:`assign_split`'s ranges). Pure Column
    arithmetic — no shuffle, no Python; the filter runs scan-side in
    the read stage (a computed hash cannot enter parquet PushedFilters,
    but it precedes any exchange). A 100 TB corpus mix (e.g.
    upsample-by-dedup-tier, downsample boilerplate) is one scan at full
    parallelism.

    Rows whose stratum is missing from ``rates`` use ``default_rate``
    (0.0 = dropped), so an unexpected new stratum fails CLOSED rather
    than flooding the sample.
    """
    for name, rate in rates.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {name!r} must be in [0, 1], got {rate}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    bucket = split_bucket(F.col(id_col), salt=salt, method=method)
    bound: Column = F.lit(int(default_rate * _M))
    for name, rate in rates.items():
        bound = F.when(
            F.col(strata_col) == F.lit(name), F.lit(int(rate * _M))
        ).otherwise(bound)
    return df.filter(bucket < bound)


def stratified_sample_sql(
    id_expr: str,
    strata_expr: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: int = 0,
) -> str:
    """WHERE-clause predicate mirroring :func:`stratified_sample`.

    Stratum names are escaped (quotes doubled); an empty ``rates``
    degenerates to the bare default bound rather than an invalid
    zero-arm CASE — both mirroring :func:`stratified_sample`.
    """
    bucket = split_bucket_sql(id_expr, salt=salt)
    default_bound = int(default_rate * _M)
    if not rates:
        return f"({bucket}) < {default_bound}"
    arms = " ".join(
        f"WHEN {strata_expr} = {_sql_str(name)} THEN {int(rate * _M)}"
        for name, rate in rates.items()
    )
    return f"({bucket}) < (CASE {arms} ELSE {default_bound} END)"


def sample_fixed_k(
    df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    salt: int = 0,
    method: str = "portable",
) -> DataFrame:
    """Deterministic uniform sample of EXACTLY k rows: the k smallest
    (bucket, id) pairs under the portable hash.

    Rate-based sampling (:func:`stratified_sample`) yields a *binomial*
    size; audits, goldens, and eval sets want an exact count. Ordering
    by the hash makes the choice uniform; the id tie-break makes it
    total; and the sample has the PREFIX property — the k+1 sample is
    the k sample plus one row — so growing a golden set never churns
    it.

    Scale shape: ORDER BY + LIMIT k plans as TakeOrderedAndProject — a
    per-partition top-k heap and a k-row merge on the driver side of
    the exchange, never a full sort of the table (the same reason G1
    top-k is cheap, SURVEY.md §2).
    """
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    bucket = split_bucket(F.col(id_col), salt=salt, method=method)
    return (
        df.withColumn("__b", bucket)
        .orderBy("__b", id_col)
        .limit(k)
        .drop("__b")
    )


def sample_per_stratum_k(
    df: DataFrame,
    strata_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: int = 0,
    method: str = "portable",
) -> DataFrame:
    """Deterministic sample of exactly min(k, |stratum|) rows PER
    stratum: row_number over (bucket, id) within each stratum, kept
    while <= k — the balanced-eval-set construction (same number of
    docs per language regardless of corpus skew).

    Same determinism/prefix properties as :func:`sample_fixed_k`,
    per stratum. One shuffle keyed on the stratum; a giant stratum
    serializes into one task's sort — for 100 TB strata prefer
    :func:`stratified_sample` with rate ≈ k/|stratum| as a pre-filter,
    then this for the exact cut (two scans, bounded sort).
    """
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    from pyspark.sql import Window

    bucket = split_bucket(F.col(id_col), salt=salt, method=method)
    w = Window.partitionBy(strata_col).orderBy("__b", id_col)
    return (
        df.withColumn("__b", bucket)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__b", "__rn")
    )


def weighted_priority_key(
    id_col: Column,
    weight_col: Column,
    salt: int = 0,
    method: str = "portable",
) -> Column:
    """Priority-sampling key u/w (Duffield-Lund-Thorup "priority
    sampling", JACM 2007; Ohlsson's sequential Poisson sampling, 1998):
    u uniform in (0, 1] from the portable hash, w the row's positive
    weight. Taking the k SMALLEST keys yields a weight-proportional
    (approximately πps) sample of exactly k rows.

    Float-portability: u = (bucket + 1) / 2^32 is an exact power-of-two
    scale (no rounding), and u / w is a single IEEE-754
    correctly-rounded double division — so Spark, DuckDB, and numpy
    produce BIT-IDENTICAL keys and therefore identical samples, the
    same portability contract as :func:`split_bucket`.
    """
    u = (
        split_bucket(id_col, salt=salt, method=method) + F.lit(1)
    ).cast("double") / F.lit(float(_M))
    return u / weight_col.cast("double")


def weighted_sample_k(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: int = 0,
    method: str = "portable",
) -> DataFrame:
    """Deterministic weight-proportional sample of EXACTLY k rows:
    the k smallest (u/w, id) priority keys.

    Rows with NULL or non-positive weight are excluded (they have no
    defined inclusion probability). Uniform :func:`sample_fixed_k` is
    the w == const special case. Changing ``salt`` re-deals the whole
    sample; for a FIXED salt the sample has the same prefix property
    as the uniform cut (k+1 sample = k sample + one row).

    Scale shape: ORDER BY + LIMIT k plans as TakeOrderedAndProject —
    a per-partition k-row heap and a k-row driver merge, never a full
    sort (same plan as :func:`sample_fixed_k`; the weight filter is a
    pushable predicate).
    """
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    key = weighted_priority_key(
        F.col(id_col), F.col(weight_col), salt=salt, method=method
    )
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__k", key)
        .orderBy("__k", id_col)
        .limit(k)
        .drop("__k")
    )


def weighted_sample_sql(
    k: int,
    weight_expr: str,
    id_expr: str = "doc_id",
    salt: int = 0,
) -> str:
    """ORDER BY ... LIMIT tail mirroring :func:`weighted_sample_k`
    (DuckDB oracle; bit-identical keys — see
    :func:`weighted_priority_key`). Callers prepend their SELECT/WHERE;
    the weight-positivity filter must be in the caller's WHERE."""
    bucket = split_bucket_sql(id_expr, salt=salt)
    return (
        f"ORDER BY ((({bucket}) + 1) / {float(_M)}) / "
        f"(({weight_expr})::DOUBLE), {id_expr} LIMIT {k}"
    )
