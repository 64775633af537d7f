"""k-truss and scalar quantization — against pure-Python/NumPy oracles."""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import edges_df


# ------------------------------------------------------------- k-truss
def _truss_py(edges, k):
    """Sequential peeling oracle: recompute support, drop, repeat."""
    cur = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    while True:
        adj = {}
        for u, v in cur:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        sup = {
            (u, v): len(adj[u] & adj[v]) for u, v in cur
        }
        nxt = {e for e in cur if sup[e] >= k - 2}
        if nxt == cur:
            return {e: sup[e] for e in cur}
        cur = nxt


K4 = list(combinations(range(4), 2))  # complete graph: its own 4-truss
# K4 plus a pendant triangle sharing one vertex, plus a dangling edge
K4_TAIL = K4 + [(3, 4), (4, 5), (3, 5), (5, 6)]
# two triangles sharing an edge; removing nothing at k=3, all at k=4
BOWTIE = [(0, 1), (1, 2), (0, 2), (1, 3), (2, 3)]
# a cascade case: a triangle strip where peeling one end cascades
STRIP = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]


@pytest.mark.parametrize("edges", [K4, K4_TAIL, BOWTIE, STRIP])
@pytest.mark.parametrize("k", [3, 4])
def test_k_truss_vs_python(spark, edges, k):
    from parallel_pagerank_spark.operators.truss import k_truss

    res = k_truss(edges_df(spark, edges), k=k)
    got = {
        (r["u"], r["v"]): r["support"]
        for r in res.truss_edges.collect()
    }
    assert got == _truss_py(edges, k)
    assert res.converged


def test_k_truss_direction_and_multiplicity_invariant(spark):
    from parallel_pagerank_spark.operators.truss import k_truss

    base = k_truss(edges_df(spark, BOWTIE), k=3)
    noisy = BOWTIE + [(v, u) for u, v in BOWTIE] + BOWTIE + [(2, 2)]
    dup = k_truss(edges_df(spark, noisy), k=3)
    assert sorted(map(tuple, base.truss_edges.collect())) == sorted(
        map(tuple, dup.truss_edges.collect())
    )


def test_k_truss_validates_k(spark):
    from parallel_pagerank_spark.operators.truss import k_truss

    with pytest.raises(ValueError):
        k_truss(edges_df(spark, BOWTIE), k=2)


def test_k_truss_empty_result(spark):
    from parallel_pagerank_spark.operators.truss import k_truss

    res = k_truss(edges_df(spark, [(0, 1), (1, 2)]), k=3)
    assert res.truss_edges.count() == 0
    assert res.converged


# -------------------------------------------------- scalar quantization
def _quantize_np(vecs, bits):
    arr = np.array(vecs, dtype=np.float64)
    lo, hi = arr.min(axis=0), arr.max(axis=0)
    levels = (1 << bits) - 1
    scale = (hi - lo) / levels
    codes = np.zeros(arr.shape, dtype=np.int64)
    nz = scale > 0
    codes[:, nz] = np.minimum(
        levels, np.floor((arr[:, nz] - lo[nz]) / scale[nz])
    ).astype(np.int64)
    deq = lo + codes * scale
    mse = ((arr - deq) ** 2).mean(axis=1)
    return codes, mse


def test_scalar_quantize_vs_numpy(spark):
    from parallel_pagerank_spark.functions.similarity import scalar_quantize

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in scalar_quantize(df, bits=8).collect()}
    codes_exp, mse_exp = _quantize_np(vecs.astype(np.float64), 8)
    for i in range(len(vecs)):
        assert rows[i]["codes"] == list(codes_exp[i])
        assert rows[i]["mse"] == pytest.approx(mse_exp[i], rel=1e-9)


def test_scalar_quantize_constant_dim_and_nulls(spark):
    from parallel_pagerank_spark.functions.similarity import scalar_quantize

    df = spark.createDataFrame(
        [(0, [1.0, 5.0]), (1, [1.0, 3.0]), (2, None)],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in scalar_quantize(df, bits=8).collect()}
    assert set(rows) == {0, 1}  # null vector skipped
    # constant dim 0 -> code 0, exact reconstruction
    assert rows[0]["codes"][0] == 0 and rows[1]["codes"][0] == 0
    assert rows[0]["codes"][1] == 255 and rows[1]["codes"][1] == 0
    assert rows[0]["mse"] == pytest.approx(0.0)
    assert rows[1]["mse"] == pytest.approx(0.0)


def test_scalar_quantize_validates_bits(spark):
    from parallel_pagerank_spark.functions.similarity import scalar_quantize

    df = spark.createDataFrame(
        [(0, [1.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError):
        scalar_quantize(df, bits=0)
