"""Single-scan data-quality expectations over any DataFrame.

No reference counterpart (the reference is a numeric PageRank engine);
this is the standard release-gate primitive of large-scale data
pipelines (the pattern popularized by Great Expectations and Deequ,
Schelter et al., VLDB 2018 "Automating large-scale data quality
verification"): a set of named row-level predicates is evaluated in ONE
pass, producing per-rule violation counts and rates — the report a
100 TB ingest job publishes before a dataset is promoted.

Scale shape: all row-level rules compile into a single wide aggregation
over one scan (each rule is a ``sum(CASE WHEN ...)`` — map-side partial,
whole-stage codegen, no Python); uniqueness rules need a per-key
aggregation and are computed as ``count(*) - count(DISTINCT key)``
inside the SAME aggregate (Spark plans the distinct with a partial
expand — still one scan). The long-form output is a constant-width
unpivot of the 1-row aggregate, never a shuffle of the data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def check_expectations(
    df: DataFrame,
    rules: dict[str, Column],
    unique: tuple[str, ...] = (),
) -> DataFrame:
    """Evaluate named expectations in one scan.

    rules: mapping rule name -> boolean Column; a row VIOLATES the rule
    when the predicate is FALSE **or NULL** (three-valued logic is
    fail-closed: an un-evaluable expectation is a violation, matching
    SQL ``count(*) FILTER (WHERE NOT coalesce(pred, FALSE))``).
    unique: column names that must be globally unique; each contributes
    a rule ``unique:<col>`` with ``count(*) - count(DISTINCT col)``
    violations (NULLs are excluded from the distinct count and so each
    NULL counts as a violation, fail-closed again).

    Returns one row per rule: ``(rule, n_rows, n_violations,
    violation_rate)`` — rate is a single IEEE division (oracle
    bit-identical).
    """
    if not rules and not unique:
        raise ValueError("no expectations given")
    aggs = [F.count(F.lit(1)).alias("__n")]
    names: list[str] = []
    for name, pred in rules.items():
        names.append(name)
        aggs.append(
            F.sum(
                F.when(F.coalesce(pred, F.lit(False)), 0).otherwise(1)
            ).alias(f"__v{len(names) - 1}")
        )
    for col in unique:
        names.append(f"unique:{col}")
        aggs.append(
            (F.count(F.lit(1)) - F.count_distinct(F.col(col))).alias(
                f"__v{len(names) - 1}"
            )
        )
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{n.replace(chr(39), chr(39) * 2)}', __v{i}"
        for i, n in enumerate(names)
    )
    return wide.select(
        F.expr(
            f"stack({len(names)}, {stack}) AS (rule, n_violations)"
        ),
        F.col("__n").alias("n_rows"),
    ).select(
        "rule",
        "n_rows",
        "n_violations",
        (
            F.col("n_violations").cast("double") / F.col("n_rows")
        ).alias("violation_rate"),
    )


def filter_valid(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Rows passing ALL row-level rules (NULL predicates fail-closed).
    Pure pushable predicates — composes with the scan."""
    if not rules:
        return df
    cond = F.lit(True)
    for pred in rules.values():
        cond = cond & F.coalesce(pred, F.lit(False))
    return df.filter(cond)
