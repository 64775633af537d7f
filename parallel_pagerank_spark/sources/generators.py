"""Deterministic graph generators.

Mirrors the reference dashboard's fixture generators (SURVEY.md §2 I1–I4,
dashboard/app.py:1441-1499, seed 42): random G(n,p), scale-free
(Barabási–Albert, emitted bidirected), complete, ring, star. Small shapes
are driver-side (they are test fixtures); the scaling graph is generated
distributed from ``spark.range`` so BENCH can size it arbitrarily with no
external data (north-rule: deterministic synthetic input).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F


def _df(spark: SparkSession, pairs) -> DataFrame:
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def random_gnp(
    spark: SparkSession, n: int, density: float = 0.3, seed: int = 42
) -> DataFrame:
    """Bernoulli(density) per ordered pair (dashboard/app.py:1457-1463)."""
    rng = np.random.default_rng(seed)
    pairs = [
        (i, j)
        for i in range(n)
        for j in range(n)
        if i != j and rng.random() < density
    ]
    if not pairs:  # min-edge rule (dashboard/app.py:1495-1499)
        pairs = [(0, min(1, n - 1))]
    return _df(spark, pairs)


def barabasi_albert(
    spark: SparkSession, n: int, m: int = 2, seed: int = 42
) -> DataFrame:
    """Preferential attachment, each undirected edge emitted both ways
    (dashboard/app.py:1464-1477). Simple BA: new node attaches to m
    distinct existing nodes sampled ∝ degree."""
    rng = np.random.default_rng(seed)
    targets = list(range(m))
    repeated: list[int] = []
    edges = []
    for v in range(m, n):
        chosen = set()
        while len(chosen) < min(m, v):
            if repeated and rng.random() < 0.9:
                cand = repeated[int(rng.integers(len(repeated)))]
            else:
                cand = int(rng.integers(v))
            chosen.add(cand)
        for t in chosen:
            edges.append((v, t))
            edges.append((t, v))
            repeated.extend([v, t])
    if not edges:
        edges = [(0, min(1, n - 1))]
    return _df(spark, edges)


def complete_graph(spark: SparkSession, n: int) -> DataFrame:
    """All ordered pairs (dashboard/app.py:1478-1483) — generated
    distributed (n² rows)."""
    r = spark.range(n)
    a = r.select(F.col("id").alias("src"))
    b = r.select(F.col("id").alias("dst"))
    return a.crossJoin(b).filter(F.col("src") != F.col("dst"))


def ring_graph(spark: SparkSession, n: int) -> DataFrame:
    """i → (i+1) % n (dashboard/app.py:1484-1487)."""
    return spark.range(n).select(
        F.col("id").alias("src"),
        F.pmod(F.col("id") + 1, F.lit(n)).alias("dst"),
    )


def star_graph(spark: SparkSession, n: int) -> DataFrame:
    """Hub 0 ↔ all spokes (dashboard/app.py:1488-1493) — the worst-case
    single-key skew fixture."""
    spokes = spark.range(1, n)
    out = spokes.select(F.lit(0).alias("src"), F.col("id").alias("dst"))
    back = spokes.select(F.col("id").alias("src"), F.lit(0).alias("dst"))
    return out.unionByName(back)


def synthetic_scaling_edges(
    spark: SparkSession,
    n_edges: int,
    n_vertices: int,
    hub_fraction: float = 0.05,
    n_hubs: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Distributed deterministic graph for BENCH scaling runs: uniform
    random endpoints from ``spark.range`` + xxhash64 (no data movement, no
    external input), with ``hub_fraction`` of edges redirected onto
    ``n_hubs`` hot destinations to keep a realistic skew component."""
    base = spark.range(n_edges)
    h = lambda k: F.xxhash64(F.col("id"), F.lit(seed + k))  # noqa: E731
    uniform_dst = F.pmod(h(1), F.lit(n_vertices))
    hub_dst = F.pmod(h(2), F.lit(n_hubs))
    is_hub = (
        F.pmod(h(3), F.lit(1_000_000))
        < F.lit(int(hub_fraction * 1_000_000))
    )
    return base.select(
        F.pmod(h(0), F.lit(n_vertices)).alias("src"),
        F.when(is_hub, hub_dst).otherwise(uniform_dst).alias("dst"),
    )
