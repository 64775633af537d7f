"""Wave-19 operators: weighted priority sampling (and siblings added
this wave)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from parallel_pagerank_spark.functions.splits import (
    _K,
    _M,
    _P,
    weighted_sample_k,
)


def _bucket_py(i: int, salt: int = 0) -> int:
    return ((i + salt) % _P) * _K % _M


def _key_py(i: int, w: float, salt: int = 0) -> float:
    # same two-step float path as the engine: exact 2^-32 scale, then
    # one IEEE double division
    return ((_bucket_py(i, salt) + 1) / float(_M)) / float(w)


@pytest.fixture()
def weighted_df(spark):
    rows = [(i, (i % 7) + 1) for i in range(300)]
    rows += [(1000, 0), (1001, -5), (1002, None)]  # excluded weights
    return spark.createDataFrame(rows, "id long, w long")


def test_weighted_sample_exact_k_and_python_parity(spark, weighted_df):
    got = weighted_sample_k(
        weighted_df, 25, "w", id_col="id"
    ).select("id")
    ids = sorted(r.id for r in got.collect())
    assert len(ids) == 25
    # pure-Python replay of the priority keys picks the same 25
    expect = sorted(
        sorted(range(300), key=lambda i: (_key_py(i, (i % 7) + 1), i))[:25]
    )
    assert ids == expect


def test_weighted_sample_excludes_bad_weights(spark, weighted_df):
    got = weighted_sample_k(weighted_df, 1000, "w", id_col="id")
    ids = {r.id for r in got.collect()}
    assert len(ids) == 300
    assert not ids & {1000, 1001, 1002}


def test_weighted_sample_prefix_property(spark, weighted_df):
    s10 = {r.id for r in
           weighted_sample_k(weighted_df, 10, "w", id_col="id").collect()}
    s11 = {r.id for r in
           weighted_sample_k(weighted_df, 11, "w", id_col="id").collect()}
    assert s10 < s11 and len(s11 - s10) == 1


def test_weighted_sample_salt_redeal(spark, weighted_df):
    a = {r.id for r in
         weighted_sample_k(weighted_df, 20, "w", id_col="id").collect()}
    b = {r.id for r in
         weighted_sample_k(weighted_df, 20, "w", id_col="id",
                           salt=7).collect()}
    assert a != b


def test_weighted_sample_proportionality():
    # statistical check in pure python (same key formula, no Spark):
    # weight-9 items should be sampled ~9x as often as weight-1 items
    # across independent salts.  Priority sampling is approximately
    # pips for k << n, so bound loosely.
    n, k = 2000, 100
    heavy = {i for i in range(n) if i % 2 == 0}
    heavy_hits = light_hits = 0
    for salt in range(40):
        keys = sorted(
            (( _key_py(i, 9.0 if i in heavy else 1.0, salt)), i)
            for i in range(n)
        )
        for _, i in keys[:k]:
            if i in heavy:
                heavy_hits += 1
            else:
                light_hits += 1
    ratio = heavy_hits / max(light_hits, 1)
    assert 6.0 < ratio < 13.5


def test_weighted_sample_plan_is_topk(spark, weighted_df):
    plan = weighted_sample_k(
        weighted_df, 5, "w", id_col="id"
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
