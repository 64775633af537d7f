"""Co-citation / bibliographic coupling and deterministic walks — each
against an independent pure-Python oracle."""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest

from tests.conftest import edges_df

# two citing pages sharing targets, a reciprocal pair, one duplicate edge
CITES = [
    (0, 10),
    (0, 11),
    (0, 12),
    (1, 10),
    (1, 12),
    (2, 10),
    (2, 2),  # self-loop: ignored
    (1, 10),  # duplicate: ignored
    (3, 13),
]


def _common_pairs(edges, mode, cap=1000, min_common=1):
    kv = set()
    for s, t in edges:
        k, x = (s, t) if mode == "cocitation" else (t, s)
        if k != x:
            kv.add((k, x))
    by_k = defaultdict(set)
    for k, x in kv:
        by_k[k].add(x)
    cnt: Counter = Counter()
    for xs in by_k.values():
        if len(xs) > cap:
            continue
        xs = sorted(xs)
        for i in range(len(xs)):
            for j in range(i + 1, len(xs)):
                cnt[(xs[i], xs[j])] += 1
    return {p: c for p, c in cnt.items() if c >= min_common}


@pytest.mark.parametrize("mode", ["cocitation", "coupling"])
@pytest.mark.parametrize("min_common", [1, 2])
def test_common_neighbor_pairs_vs_python(spark, mode, min_common):
    from parallel_pagerank_spark.operators.linkanalysis import (
        common_neighbor_pairs,
    )

    got = {
        (r["u"], r["v"]): r["n_common"]
        for r in common_neighbor_pairs(
            edges_df(spark, CITES), mode=mode, min_common=min_common
        ).collect()
    }
    assert got == _common_pairs(CITES, mode, min_common=min_common)


def test_degree_cap_excludes_hub(spark):
    from parallel_pagerank_spark.operators.linkanalysis import (
        common_neighbor_pairs,
        excluded_hubs,
    )

    hub = [(99, t) for t in range(20)] + CITES
    e = edges_df(spark, hub)
    got = {
        (r["u"], r["v"]): r["n_common"]
        for r in common_neighbor_pairs(
            e, mode="cocitation", degree_cap=5
        ).collect()
    }
    assert got == _common_pairs(hub, "cocitation", cap=5)
    excl = excluded_hubs(e, mode="cocitation", degree_cap=5).collect()
    assert [(r["k"], r["k_deg"]) for r in excl] == [(99, 20)]


WALK_GRAPH = [
    (0, 1),
    (0, 2),
    (1, 2),
    (1, 3),
    (2, 0),
    (2, 3),
    (3, 4),  # 4 is a sink: walks through it stop early
    (0, 1),  # duplicate edge: no effect on the min selector
]


def _walks_python(edges, sources, length):
    from parallel_pagerank_spark.operators.walks import (
        WALK_A,
        WALK_B,
        WALK_C,
        WALK_MODULUS,
    )

    adj = defaultdict(set)
    for s, t in edges:
        adj[s].add(t)
    rows = set()
    for src in set(sources):
        cur = src
        rows.add((src, 0, src))
        for t in range(1, length + 1):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            here = cur
            cur = min(
                nbrs,
                key=lambda d: (
                    (
                        WALK_A * (d % WALK_MODULUS)
                        + WALK_B * (here % WALK_MODULUS)
                        + WALK_C * t
                    )
                    % WALK_MODULUS,
                    d,
                ),
            )
            rows.add((src, t, cur))
    return rows


@pytest.mark.parametrize("length", [1, 4, 8])
def test_deterministic_walks_vs_python(spark, length):
    from parallel_pagerank_spark.operators.walks import deterministic_walks

    sources = spark.createDataFrame([(0,), (3,), (4,)], "id long")
    res = deterministic_walks(
        edges_df(spark, WALK_GRAPH), sources, walk_length=length
    )
    got = {
        (r["walk_id"], r["step"], r["vertex"]) for r in res.walks.collect()
    }
    assert got == _walks_python(WALK_GRAPH, [0, 3, 4], length)


def test_walk_transitions(spark):
    from parallel_pagerank_spark.operators.walks import (
        deterministic_walks,
        walk_transitions,
    )

    sources = spark.createDataFrame([(0,), (1,), (2,)], "id long")
    res = deterministic_walks(
        edges_df(spark, WALK_GRAPH), sources, walk_length=6
    )
    oracle: Counter = Counter()
    walks = defaultdict(dict)
    for w, s, v in _walks_python(WALK_GRAPH, [0, 1, 2], 6):
        walks[w][s] = v
    for steps in walks.values():
        for s in range(len(steps) - 1):
            oracle[(steps[s], steps[s + 1])] += 1
    got = {
        (r["src"], r["dst"]): r["n_walks"]
        for r in walk_transitions(res).collect()
    }
    assert got == dict(oracle)


# ---------------------------------------------------------- Adamic-Adar
def _aa_python(edges, weight="adamic_adar", cap=1000, exclude=True):
    import math

    nbrs = defaultdict(set)
    for s, t in edges:
        if s != t:
            nbrs[s].add(t)
            nbrs[t].add(s)
    existing = {(min(s, t), max(s, t)) for s, t in edges if s != t}
    out = {}
    for k, nk in nbrs.items():
        if len(nk) > cap or len(nk) < 2:  # deg-1 vertices emit no pairs
            continue
        if weight == "adamic_adar":
            w = 1.0 / math.log(len(nk))
        elif weight == "resource_allocation":
            w = 1.0 / len(nk)
        else:
            w = 1.0
        ns = sorted(nk)
        for i, u in enumerate(ns):
            for v in ns[i + 1:]:
                n, s = out.get((u, v), (0, 0.0))
                out[(u, v)] = (n + 1, s + w)
    if exclude:
        out = {p: v for p, v in out.items() if p not in existing}
    return out


AA_EDGES = [(1, 2), (2, 3), (1, 4), (4, 3), (5, 1), (2, 2), (1, 2)]


@pytest.mark.parametrize(
    "weight", ["adamic_adar", "resource_allocation", "common"]
)
def test_adamic_adar_hand_graph(spark, weight):
    from parallel_pagerank_spark.operators.linkanalysis import adamic_adar

    got = {
        (r["u"], r["v"]): (r["n_common"], r["score"])
        for r in adamic_adar(
            edges_df(spark, AA_EDGES), weight=weight
        ).collect()
    }
    want = _aa_python(AA_EDGES, weight=weight)
    assert set(got) == set(want)
    for p in want:
        assert got[p][0] == want[p][0]
        assert got[p][1] == pytest.approx(want[p][1], abs=1e-12)
    # (1,3) shares neighbors 2 and 4 and is NOT an edge -> present;
    # (1,2) is an edge -> excluded
    assert (1, 3) in got and (1, 2) not in got


def test_adamic_adar_include_existing_and_cap(spark):
    from parallel_pagerank_spark.operators.linkanalysis import (
        adamic_adar,
        excluded_hubs_undirected,
    )

    df = edges_df(spark, AA_EDGES)
    inc = {
        (r["u"], r["v"]): r["n_common"]
        for r in adamic_adar(df, exclude_existing=False).collect()
    }
    want = _aa_python(AA_EDGES, exclude=False)
    assert inc == {p: n for p, (n, _) in want.items()}
    # cap=2 excludes vertex 1 (undirected deg 3) from pair generation
    capped = {
        (r["u"], r["v"]): r["n_common"]
        for r in adamic_adar(df, degree_cap=2).collect()
    }
    assert capped == {
        p: n for p, (n, _) in _aa_python(AA_EDGES, cap=2).items()
    }
    hubs = {
        r["k"]: r["k_deg"]
        for r in excluded_hubs_undirected(df, degree_cap=2).collect()
    }
    assert hubs == {1: 3}


def test_adamic_adar_validates_weight(spark):
    from parallel_pagerank_spark.operators.linkanalysis import adamic_adar

    with pytest.raises(ValueError):
        adamic_adar(edges_df(spark, AA_EDGES), weight="katz")


def test_adamic_adar_leaf_vertices_no_ansi_abort(spark):
    # path graph 1-2-3: endpoints have degree 1; before the deg >= 2
    # pre-filter, the 1/ln(deg) weight projection evaluated 1/ln(1) for
    # the leaf rows and ANSI mode aborted the job (sf0.001 bench find).
    from parallel_pagerank_spark.operators.linkanalysis import adamic_adar

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    rows = adamic_adar(edges).collect()
    assert len(rows) == 1
    r = rows[0]
    import math

    assert (r.u, r.v, r.n_common) == (1, 3, 1)
    assert r.score == pytest.approx(1.0 / math.log(2.0), abs=1e-12)
