"""Neighborhood-function sketches vs a pure-Python bit-exact oracle."""

from __future__ import annotations

from parallel_pagerank_spark.operators.neighborhood import (
    FM_A0,
    FM_A_STEP,
    FM_B0,
    FM_B_STEP,
    FM_PRIME,
    NeighborhoodResult,
    ball_size_estimates,
    effective_diameter,
    neighborhood_sketches,
)
from tests.conftest import edges_df


def _h(v: int, j: int) -> int:
    return (
        (FM_A0 + FM_A_STEP * j) * (v % FM_PRIME) + FM_B0 + FM_B_STEP * j
    ) % FM_PRIME + 1


def _register(ball, j: int) -> int:
    r = 0
    for w in ball:
        h = _h(w, j)
        r |= h & -h
    return r


def _exact_balls(edges, t: int):
    """ball(v, t) along out-edges by t rounds of neighbor expansion."""
    verts = {v for e in edges for v in e}
    out = {v: set() for v in verts}
    for s, d in edges:
        out[s].add(d)
    balls = {v: {v} for v in verts}
    for _ in range(t):
        balls = {
            v: b | set().union(*(balls[w] for w in out[v]), set())
            for v, b in balls.items()
        }
    return balls


def _test_graph():
    # deterministic 60-vertex multigraph with sinks (50..59 have no
    # out-edges beyond the formula's range hits) and a few hubs
    edges = []
    for i in range(50):
        edges.append((i, (i * 3 + 1) % 60))
        edges.append((i, (i * 7 + 2) % 60))
    return edges


def test_sketches_bit_exact_vs_python_oracle(spark):
    edges = _test_graph()
    res = neighborhood_sketches(edges_df(spark, edges), max_rounds=3)
    assert res.supersteps == 3
    got = {
        row["id"]: [row[f"s{j}"] for j in range(8)]
        for row in res.sketches.collect()
    }
    balls = _exact_balls(edges, 3)
    assert set(got) == set(balls)
    for v, ball in balls.items():
        expect = [_register(ball, j) for j in range(8)]
        assert got[v] == expect, f"vertex {v}"


def test_growth_monotone_and_converges(spark):
    edges = _test_graph()
    res = neighborhood_sketches(edges_df(spark, edges), max_rounds=40)
    bits = [g["total_bits"] for g in res.growth]
    assert bits == sorted(bits)
    assert res.converged  # 60 vertices: diameter far below 40
    # fixpoint sketches == sketches of the fully-converged exact balls
    balls = _exact_balls(edges, res.supersteps)
    got = {
        row["id"]: [row[f"s{j}"] for j in range(8)]
        for row in res.sketches.collect()
    }
    for v, ball in balls.items():
        assert got[v] == [_register(ball, j) for j in range(8)]
    d = effective_diameter(res)
    assert 0 <= d <= res.supersteps


def test_estimates_in_sane_range(spark):
    # directed clique on 40 vertices: every 1-ball is all 40 vertices
    n = 40
    edges = [(i, j) for i in range(n) for j in range(n) if i != j]
    res = neighborhood_sketches(
        edges_df(spark, edges), max_rounds=1, num_registers=16
    )
    ests = [r["est"] for r in ball_size_estimates(res.sketches).collect()]
    assert len(ests) == n
    # FM with 16 registers: loose 4x bracket is far beyond its std error
    assert all(n / 4 <= e <= n * 4 for e in ests)


def test_undirected_symmetrizes(spark):
    res = neighborhood_sketches(
        edges_df(spark, [(1, 2), (2, 3)]), max_rounds=5, directed=False
    )
    balls = {1: {1, 2, 3}, 2: {1, 2, 3}, 3: {1, 2, 3}}
    got = {
        row["id"]: [row[f"s{j}"] for j in range(8)]
        for row in res.sketches.collect()
    }
    for v, ball in balls.items():
        assert got[v] == [_register(ball, j) for j in range(8)]
    assert isinstance(res, NeighborhoodResult)
