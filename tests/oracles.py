"""NumPy / pure-Python oracles for the graph operators.

These implement *exactly* the reference semantics (cited per function) as
sequential dense algorithms; the Spark engine is compared against them.
They are test assets — never imported by the engine.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np


def pagerank_oracle(
    edges: list[tuple[int, int]],
    num_nodes: int | None = None,
    d: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 10_000,
    teleport: np.ndarray | None = None,
    weights: list[float] | None = None,
) -> tuple[np.ndarray, int, list[dict]]:
    """Dense power-iteration PageRank matching /root/reference/pagerank_mpi/
    pagerank_mpi.c:132-231 (Distributed_PageRank_csr) semantics:

    - num_nodes = max_id + 1 (csr_graph.c:27) unless given explicitly
    - init p = 1/N (pagerank_mpi.c:44-54)
    - duplicate edges count with multiplicity (csr_graph.c:19-23)
    - per iteration: S = sum of ranks of out-degree-0 vertices
      (pagerank_mpi.c:166-174); contrib[dst] += p[src]/out_deg(src)
      (pagerank_mpi.c:176-192); p' = d*(contrib + S/N) + (1-d)/N
      (pagerank_mpi.c:194-196)
    - stop when L1 = sum|p'-p| < tol, checked after the update
      (pagerank_mpi.c:201-226); iteration count = number of updates done.

    With ``weights`` (aligned with ``edges``), rank flows proportionally to
    weight/Σweights(src) — weighted PageRank; a vertex is dangling iff it
    has no out-edges.

    Returns (ranks, iterations, per-iteration metrics list).
    """
    if num_nodes is None:
        num_nodes = max(max(s, t) for s, t in edges) + 1 if edges else 1
    n = num_nodes
    if weights is None:
        weights = [1.0] * len(edges)
    out_deg = np.zeros(n, dtype=np.int64)
    wsum = np.zeros(n, dtype=np.float64)
    for (s, _t), wt in zip(edges, weights):
        out_deg[s] += 1
        wsum[s] += wt
    if teleport is None:
        v = np.full(n, 1.0 / n, dtype=np.float64)
    else:
        v = np.asarray(teleport, dtype=np.float64)
        v = v / v.sum()
    p = v.copy()
    metrics = []
    iters = 0
    for _ in range(max_iter):
        dangling = p[out_deg == 0].sum()
        contrib = np.zeros(n, dtype=np.float64)
        for (s, t), wt in zip(edges, weights):
            contrib[t] += p[s] * (wt / wsum[s])
        p_new = d * (contrib + dangling * v) + (1.0 - d) * v
        delta = np.abs(p_new - p)
        l1 = float(delta.sum())
        max_err = float(delta.max())
        iters += 1
        metrics.append({"iteration": iters, "l1": l1, "max_err": max_err})
        p = p_new
        if l1 < tol:
            break
    return p, iters, metrics


def connected_components_oracle(
    edges: list[tuple[int, int]], num_nodes: int
) -> dict[int, int]:
    """Undirected connected components; component id = min vertex id in the
    component. Union-find. Isolated ids (< num_nodes) are their own component.
    """
    parent = list(range(num_nodes))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, t in edges:
        rs, rt = find(s), find(t)
        if rs != rt:
            if rs < rt:
                parent[rt] = rs
            else:
                parent[rs] = rt
    return {i: find(i) for i in range(num_nodes)}


def triangle_count_oracle(edges: list[tuple[int, int]], num_nodes: int) -> int:
    """Count distinct triangles of the undirected simple graph underlying the
    edge set (canonicalize src<dst, dedupe, drop self-loops)."""
    adj = defaultdict(set)
    canon = set()
    for s, t in edges:
        if s == t:
            continue
        a, b = (s, t) if s < t else (t, s)
        canon.add((a, b))
    for a, b in canon:
        adj[a].add(b)
        adj[b].add(a)
    count = 0
    for a, b in canon:
        # common neighbors c with a < b < c to count each triangle once
        for c in adj[a] & adj[b]:
            if c > b:
                count += 1
    return count


def per_vertex_triangles_oracle(
    edges: list[tuple[int, int]], num_nodes: int
) -> dict[int, int]:
    """Per-vertex triangle participation counts (each triangle adds 1 to each
    of its three corners)."""
    adj = defaultdict(set)
    canon = set()
    for s, t in edges:
        if s == t:
            continue
        a, b = (s, t) if s < t else (t, s)
        canon.add((a, b))
    for a, b in canon:
        adj[a].add(b)
        adj[b].add(a)
    counts = Counter()
    for a, b in canon:
        for c in adj[a] & adj[b]:
            if c > b:
                counts[a] += 1
                counts[b] += 1
                counts[c] += 1
    return {i: counts.get(i, 0) for i in range(num_nodes)}


def label_propagation_oracle(
    edges: list[tuple[int, int]], num_nodes: int, max_iter: int = 10
) -> dict[int, int]:
    """Synchronous label propagation over the undirected SIMPLE graph
    (duplicate edges deduped — each neighbor's label counts once, matching
    the engine's symmetrize() contract): every superstep each vertex with
    >=1 neighbor adopts the most frequent label among its neighbors, ties
    broken by MIN label. Vertices without neighbors keep their own id.
    Deterministic; stops early when stable.
    """
    adj = defaultdict(set)
    for s, t in edges:
        if s == t:
            continue
        adj[s].add(t)
        adj[t].add(s)
    labels = {i: i for i in range(num_nodes)}
    for _ in range(max_iter):
        new_labels = dict(labels)
        for v in range(num_nodes):
            if not adj[v]:
                continue
            freq = Counter(labels[u] for u in adj[v])
            best = min(
                freq.items(), key=lambda kv: (-kv[1], kv[0])
            )  # max count, then min label
            new_labels[v] = best[0]
        if new_labels == labels:
            break
        labels = new_labels
    return labels


def min_label_propagation_oracle(
    edges: list[tuple[int, int]], num_nodes: int
) -> tuple[dict[int, int], int]:
    """Connected components exactly as the engine computes them: synchronous
    min-label propagation to fixpoint. Returns (labels, supersteps)."""
    adj = defaultdict(set)
    for s, t in edges:
        if s != t:
            adj[s].add(t)
            adj[t].add(s)
    labels = {i: i for i in range(num_nodes)}
    steps = 0
    while True:
        changed = False
        new_labels = {}
        for v in range(num_nodes):
            nl = min([labels[v]] + [labels[u] for u in adj[v]])
            new_labels[v] = nl
            if nl != labels[v]:
                changed = True
        steps += 1
        labels = new_labels
        if not changed:
            break
    return labels, steps


# ---------------------------------------------------------------- fixtures

SMALL_GRAPH = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 0), (3, 1), (3, 2)]


def load_edge_list(path: str) -> list[tuple[int, int]]:
    """Parse reference edge-list format: whitespace-separated int pairs,
    '#' comment lines skipped, malformed lines dropped (csr_graph.c:16-23)."""
    edges = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            try:
                edges.append((int(parts[0]), int(parts[1])))
            except (ValueError, IndexError):
                continue
    return edges


def k_core_oracle(
    edges: list[tuple[int, int]], k: int
) -> dict[int, int]:
    """k-core by sequential peeling (order-independent fixpoint): returns
    {vertex: degree-in-core} for the maximal subgraph with min degree >= k
    of the undirected simple graph."""
    adj = defaultdict(set)
    for s, t in edges:
        if s != t:
            adj[s].add(t)
            adj[t].add(s)
    alive = set(adj)
    changed = True
    while changed:
        changed = False
        for v in list(alive):
            if len(adj[v] & alive) < k:
                alive.discard(v)
                changed = True
    return {v: len(adj[v] & alive) for v in alive}


def scc_oracle(edges: list[tuple[int, int]], n: int) -> dict[int, int]:
    """Iterative Tarjan SCC over vertices 0..n-1: returns
    {vertex: min vertex id of its SCC} (matching the engine's labeling
    rule)."""
    adj = defaultdict(list)
    for s, t in edges:
        adj[s].append(t)
    index = {}
    lowlink = {}
    on_stack = set()
    stack = []
    comp_of = {}
    counter = [0]
    for root in range(n):
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = lowlink[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on_stack:
                    lowlink[v] = min(lowlink[v], index[w])
            if recurse:
                continue
            work.pop()
            if work:
                u = work[-1][0]
                lowlink[u] = min(lowlink[u], lowlink[v])
            if lowlink[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    comp_of[w] = m
    return comp_of
