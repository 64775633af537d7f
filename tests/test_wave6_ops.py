"""Modularity, power-law MLE, and table profiler — vs hand/NumPy oracles."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import edges_df

# two triangles joined by one bridge edge — the textbook two-community
# graph: m=7 undirected edges
TWO_TRIANGLES = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]


def _modularity_py(und_edges, label_of):
    m = len(und_edges)
    intra = sum(1 for u, v in und_edges if label_of[u] == label_of[v])
    deg = {}
    for u, v in und_edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    deg_c = {}
    for v, d in deg.items():
        deg_c[label_of[v]] = deg_c.get(label_of[v], 0) + d
    q = 0.0
    for c, dc in deg_c.items():
        ec = sum(
            1
            for u, v in und_edges
            if label_of[u] == c and label_of[v] == c
        )
        q += ec / m - (dc / (2 * m)) ** 2
    return q, intra


def test_modularity_two_communities(spark):
    from parallel_pagerank_spark.operators.stats import modularity

    labels = {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1}
    lab = spark.createDataFrame(
        [(k, v) for k, v in labels.items()], "id long, label long"
    )
    row = modularity(edges_df(spark, TWO_TRIANGLES), lab).collect()[0]
    q_exp, intra_exp = _modularity_py(TWO_TRIANGLES, labels)
    assert row["modularity"] == pytest.approx(q_exp, rel=1e-12)
    assert row["intra_edges"] == intra_exp == 6
    assert row["n_communities"] == 2
    assert row["m_edges"] == 7
    assert row["modularity"] > 0.3  # genuinely community-structured


def test_modularity_single_community_and_direction_invariance(spark):
    from parallel_pagerank_spark.operators.stats import modularity

    lab = spark.createDataFrame(
        [(i, 7) for i in range(6)], "id long, label long"
    )
    one = modularity(edges_df(spark, TWO_TRIANGLES), lab).collect()[0]
    # all edges internal: Q = 1 - 1 = 0 for a single community
    assert one["modularity"] == pytest.approx(0.0, abs=1e-12)
    rev = [(v, u) for u, v in TWO_TRIANGLES] + TWO_TRIANGLES  # multi+rev
    two = modularity(edges_df(spark, rev), lab).collect()[0]
    assert two["m_edges"] == one["m_edges"] == 7


def test_powerlaw_alpha_vs_numpy(spark):
    from parallel_pagerank_spark.operators.stats import powerlaw_alpha

    edges = [(i, i % 3) for i in range(3, 30)] + [(0, 1), (1, 2)]
    row = powerlaw_alpha(edges_df(spark, edges), xmin=1).collect()[0]
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    ds = np.array([d for d in deg.values() if d >= 1], dtype=float)
    assert row["n_tail"] == len(ds)
    assert row["alpha"] == pytest.approx(
        1.0 + len(ds) / np.log(ds / 1.0).sum(), rel=1e-12
    )
    with pytest.raises(ValueError):
        powerlaw_alpha(edges_df(spark, edges), xmin=0)


def test_profile_table(spark):
    from parallel_pagerank_spark.functions.profile import profile_table

    df = spark.createDataFrame(
        [
            (1, "alpha", None, [1.0]),
            (2, "beta", 5.0, [2.0]),
            (2, None, 7.5, None),
        ],
        "k long, s string, x double, arr array<double>",
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert set(prof) == {"k", "s", "x", "arr"}
    assert all(r["n_rows"] == 3 for r in prof.values())
    assert prof["k"]["n_null"] == 0 and prof["k"]["n_distinct"] == 2
    assert prof["k"]["min_str"] == "1" and prof["k"]["max_str"] == "2"
    assert prof["s"]["n_null"] == 1 and prof["s"]["n_distinct"] == 2
    assert prof["s"]["min_str"] == "alpha" and prof["s"]["max_str"] == "beta"
    assert prof["x"]["n_null"] == 1 and prof["x"]["min_str"] == "5.0"
    # complex type: nulls + distincts only, no ordering
    assert prof["arr"]["n_null"] == 1 and prof["arr"]["n_distinct"] == 2
    assert prof["arr"]["min_str"] is None and prof["arr"]["max_str"] is None


def test_profile_table_approx_mode_runs(spark):
    from parallel_pagerank_spark.functions.profile import profile_table

    df = spark.range(100).select(F.col("id").alias("k"))
    prof = {r["column"]: r for r in profile_table(df, approx=True).collect()}
    # HLL++ estimate within its default 5% rsd of the truth
    assert abs(prof["k"]["n_distinct"] - 100) <= 15
