"""Wave-8 operators: stratified sampling, n-gram decontamination,
token entropy, and topological levels — against hand/NumPy oracles."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from tests.conftest import edges_df


# ------------------------------------------------- stratified sampling
def test_stratified_sample_deterministic_and_monotone(spark):
    from parallel_pagerank_spark.functions.splits import (
        split_bucket,
        stratified_sample,
    )

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "de")
        .otherwise("fr")
        .alias("lang"),
    )
    rates = {"en": 0.5, "de": 0.1}
    out = stratified_sample(df, "lang", rates, id_col="doc_id")
    rows = {r["doc_id"]: r["lang"] for r in out.collect()}
    # deterministic: second run identical
    rows2 = {
        r["doc_id"]: r["lang"]
        for r in stratified_sample(df, "lang", rates, id_col="doc_id")
        .repartition(7)
        .collect()
    }
    assert rows == rows2
    # fail-closed: the stratum missing from rates is fully dropped
    assert "fr" not in rows.values()
    # rates land near target (portable hash is uniform)
    n_en = sum(1 for v in rows.values() if v == "en")
    n_de = sum(1 for v in rows.values() if v == "de")
    assert abs(n_en / (2000 / 3) - 0.5) < 0.08
    assert abs(n_de / (2000 / 3) - 0.1) < 0.05
    # monotone growth: raising a rate only ADDS rows
    bigger = stratified_sample(
        df, "lang", {"en": 0.8, "de": 0.1}, id_col="doc_id"
    )
    big_ids = {r["doc_id"] for r in bigger.collect()}
    assert set(rows) <= big_ids
    # membership is exactly the bucket predicate (oracle-portable)
    bucket = {
        r["doc_id"]: r["b"]
        for r in df.select(
            "doc_id", split_bucket(F.col("doc_id")).alias("b")
        ).collect()
    }
    expect = {
        i
        for i, b in bucket.items()
        if (i % 3 == 0 and b < int(0.5 * 2**32))
        or (i % 3 == 1 and b < int(0.1 * 2**32))
    }
    assert set(rows) == expect


def test_stratified_sample_validates_rates(spark):
    from parallel_pagerank_spark.functions.splits import stratified_sample

    df = spark.range(5).select(F.col("id").alias("doc_id"), F.lit("en").alias("lang"))
    with pytest.raises(ValueError):
        stratified_sample(df, "lang", {"en": 1.5})
    with pytest.raises(ValueError):
        stratified_sample(df, "lang", {"en": 0.5}, default_rate=-0.1)


def test_stratified_sample_sql_mirror(spark):
    import duckdb

    from parallel_pagerank_spark.functions.splits import (
        stratified_sample,
        stratified_sample_sql,
    )

    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("g"),
    )
    rates = {"a": 0.3, "b": 0.7}
    got = sorted(
        r["doc_id"] for r in stratified_sample(df, "g", rates).collect()
    )
    pred = stratified_sample_sql("i", "g", rates)
    want = [
        r[0]
        for r in duckdb.sql(
            "SELECT i FROM (SELECT unnest(generate_series(0, 499)) AS i), "
            "LATERAL (SELECT CASE WHEN i % 2 = 0 THEN 'a' ELSE 'b' END AS g) "
            f"WHERE {pred} ORDER BY i"
        ).fetchall()
    ]
    assert got == want


def test_stratified_sample_sql_empty_rates_and_quoting():
    """ADVICE r3: empty rates must emit a valid bare bound (no zero-arm
    CASE) and stratum names with quotes must be escaped, mirroring the
    engine side which handles both."""
    import duckdb

    from parallel_pagerank_spark.functions.splits import (
        _M,
        stratified_sample_sql,
    )

    # empty rates -> bare default bound, parseable SQL
    pred = stratified_sample_sql("i", "g", {}, default_rate=0.5)
    assert "CASE" not in pred
    n = duckdb.sql(
        "SELECT count(*) FROM (SELECT unnest(generate_series(0, 999)) "
        f"AS i), LATERAL (SELECT 'x' AS g) WHERE {pred}"
    ).fetchone()[0]
    assert 0 < n < 1000
    # a stratum name containing a single quote must not break the SQL
    pred2 = stratified_sample_sql("i", "g", {"o'brien": 1.0})
    got = duckdb.sql(
        "SELECT count(*) FROM (SELECT unnest(generate_series(0, 99)) "
        f"AS i), LATERAL (SELECT 'o''brien' AS g) WHERE {pred2}"
    ).fetchone()[0]
    assert got == 100
    assert str(_M) in pred2


def test_split_case_sql_single_split_and_quoting():
    import duckdb

    from parallel_pagerank_spark.functions.splits import split_case_sql

    # single split -> bare literal, no CASE
    expr = split_case_sql("i", splits=(("all", 1.0),))
    assert expr == "'all'"
    # quoted split names survive
    expr2 = split_case_sql("i", splits=(("tr'n", 0.5), ("te'st", 0.5)))
    vals = {
        r[0]
        for r in duckdb.sql(
            "SELECT DISTINCT "
            + expr2
            + " FROM (SELECT unnest(generate_series(0, 199)) AS i)"
        ).fetchall()
    }
    assert vals <= {"tr'n", "te'st"} and len(vals) == 2


# --------------------------------------------- n-gram decontamination
def _ngrams_py(text: str, n: int) -> set[str]:
    toks = text.lower().split()
    return {
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    }


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "pack my box with five dozen liquor jugs"),
    (2, "sphinx of black quartz judge my vow"),
    (3, "the quick brown fox sleeps all day long"),  # shares 3-grams w/ 0
    (4, "a b"),  # too short for 3-grams
    (5, "judge my vow said the sphinx of black quartz"),  # overlaps 2
]


def test_ngram_contamination_vs_python(spark):
    from parallel_pagerank_spark.functions.decontam import (
        ngram_contamination,
    )

    n = 3
    train_rows = [DOCS[0], DOCS[3], DOCS[4]]
    test_rows = [DOCS[1], DOCS[2], DOCS[5]]
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    test = spark.createDataFrame(test_rows, "doc_id long, text string")

    # hand oracle
    test_g = {i: _ngrams_py(t, n) for i, t in test_rows}
    want = {}
    for i, t in train_rows:
        shared = set()
        hits = set()
        for j, g in test_g.items():
            common = _ngrams_py(t, n) & g
            if common:
                shared |= common
                hits.add(j)
        if shared:
            want[i] = (len(shared), len(hits), min(hits))

    for key in ("text", "hash64"):
        got = {
            r["doc_id"]: (r["n_shared"], r["n_test_docs"], r["first_test_doc"])
            for r in ngram_contamination(train, test, n=n, key=key).collect()
        }
        assert got == want, key


def test_ngram_contamination_detects_exact_and_partial(spark):
    from parallel_pagerank_spark.functions.decontam import (
        ngram_contamination,
    )

    train = spark.createDataFrame(
        [(10, "alpha beta gamma delta"), (11, "nothing in common here")],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(99, "ALPHA   beta\tgamma delta")],  # same after normalization
        "doc_id long, text string",
    )
    out = ngram_contamination(train, test, n=3).collect()
    assert len(out) == 1
    r = out[0]
    assert r["doc_id"] == 10
    assert r["n_shared"] == 2  # 'alpha beta gamma', 'beta gamma delta'
    assert r["first_test_doc"] == 99


def test_ngram_contamination_validates(spark):
    from parallel_pagerank_spark.functions.decontam import (
        ngram_contamination,
    )

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        ngram_contamination(df, df, n=0)
    with pytest.raises(ValueError):
        ngram_contamination(df, df, key="md5")


# --------------------------------------------------------- token entropy
def test_token_entropy_vs_python(spark):
    from parallel_pagerank_spark.functions.text import token_entropy

    rows = [
        (0, "a a a a"),  # zero entropy
        (1, "a b c d"),  # maximal: ln 4
        (2, "a a b b b c"),
        (3, ""),  # empty
        (4, None),  # null text
        (5, "word"),  # single token
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in token_entropy(docs).collect()}
    for i, t in rows:
        toks = (t or "").lower().split()
        c = Counter(toks)
        T = len(toks)
        h = (
            math.log(T) - sum(v * math.log(v) for v in c.values()) / T
            if T
            else 0.0
        )
        r = got[i]
        assert r["n_tokens"] == T
        assert r["n_distinct"] == len(c)
        assert abs(r["entropy"] - h) < 1e-12, i
        if len(c) > 1:
            assert abs(r["entropy_ratio"] - h / math.log(len(c))) < 1e-12
        else:
            assert r["entropy_ratio"] == 0.0
    assert abs(got[1]["entropy"] - math.log(4)) < 1e-12
    assert got[0]["entropy"] == 0.0


def test_token_entropy_deterministic_and_boundary_margin(spark):
    """r5 driver-hash fix: the Σ c·ln(c) term folds left-to-right over
    the ASCENDING-SORTED count multiset, so the entropy is a fixed
    property of the data — bit-identical under any repartitioning —
    instead of varying with Spark's partition combine order (the r4
    flake: an order-free float sum rounded to 6 decimals straddled a
    boundary on the driver's run and not on the local one). Residual
    cross-engine noise is the ~1-ulp libm ln() spread, bounded by
    n_distinct·ulp ≈ 1e-13; every round(·, 6)-consumed value on the
    gate data must sit > 1e-11 from its nearest 0.5e-6 rounding
    boundary (measured margin ≈ 2.5e-10 at sf0.001, 1.3e-10 at sf0.1)
    so no conforming libm can flip the rounded digit."""
    from parallel_pagerank_spark.functions.text import token_entropy

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out1 = {r["doc_id"]: r for r in token_entropy(docs).collect()}
    out2 = {
        r["doc_id"]: r
        for r in token_entropy(docs.repartition(17, "doc_id")).collect()
    }
    assert set(out1) == set(out2) and len(out1) == 500
    for k, a in out1.items():
        b = out2[k]
        # bit-identical, not just close: fold order is data-defined
        assert a["entropy"] == b["entropy"], k
        assert a["entropy_ratio"] == b["entropy_ratio"], k
    for r in out1.values():
        for v in (r["entropy"], r["entropy_ratio"]):
            frac = (abs(v) * 1e6) % 1.0
            assert abs(frac - 0.5) > 1e-5, r


# ---------------------------------------------------- topological levels
def _topo_py(edges):
    """Longest-path levels by relaxation until fixpoint (DAG assumed)."""
    nodes = {u for e in edges for u in e}
    lvl = {v: 0 for v in nodes}
    changed = True
    while changed:
        changed = False
        for u, v in edges:
            if u != v and lvl[u] + 1 > lvl[v]:
                lvl[v] = lvl[u] + 1
                changed = True
    return lvl


DAGS = [
    # diamond: depth 2
    [(0, 1), (0, 2), (1, 3), (2, 3)],
    # chain + shortcut: longest path wins (3, not 1)
    [(0, 1), (1, 2), (2, 3), (0, 3)],
    # two disjoint chains of different depth + isolated-pair edge
    [(0, 1), (1, 2), (10, 11), (20, 21), (21, 22), (22, 23)],
    # multi-parent joins
    [(0, 2), (1, 2), (2, 3), (1, 3), (4, 3)],
]


@pytest.mark.parametrize("edges", DAGS)
def test_topological_levels_vs_python(spark, edges):
    from parallel_pagerank_spark.operators.scc import topological_levels

    df = spark.createDataFrame(edges, "src_scc long, dst_scc long")
    res = topological_levels(df)
    assert res.converged
    got = {r["id"]: r["level"] for r in res.levels.collect()}
    assert got == _topo_py(edges)
    # every edge strictly increases level (the defining DAG property)
    for u, v in edges:
        assert got[u] < got[v]


def test_topological_levels_cycle_reports_nonconverged(spark):
    from parallel_pagerank_spark.operators.scc import topological_levels

    df = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src_scc long, dst_scc long"
    )
    res = topological_levels(df, max_iter=5)
    assert not res.converged
    assert res.rounds == 5


def test_topological_levels_on_condensation(spark):
    """End-to-end: SCC → condensation → levels on a two-ring graph."""
    from parallel_pagerank_spark.operators.scc import (
        condensation_edges,
        strongly_connected_components,
        topological_levels,
    )

    # ring {0,1,2} → ring {3,4} → vertex 5
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 3), (2, 3), (4, 5)]
    df = edges_df(spark, edges)
    res = strongly_connected_components(df)
    dag = condensation_edges(df, res.components)
    topo = topological_levels(dag)
    assert topo.converged
    lv = {r["id"]: r["level"] for r in topo.levels.collect()}
    assert lv == {0: 0, 3: 1, 5: 2}
