"""Pure-NumPy / pure-Python oracles (NetworkX/SciPy are not in this
container; these implement the same math directly)."""

from __future__ import annotations

import numpy as np


def pagerank_classic_oracle(
    n: int,
    edges: list[tuple[int, int]],
    index: dict[int, int],
    damping: float = 0.85,
    tol: float = 1e-12,
    max_iter: int = 1000,
) -> np.ndarray:
    """Textbook power iteration with uniform teleport + dangling
    redistribution — identical math to NetworkX pagerank."""
    out_deg = np.zeros(n)
    for s, _ in edges:
        out_deg[index[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        contrib = np.divide(r, out_deg, out=np.zeros(n), where=out_deg > 0)
        msg = np.zeros(n)
        for s, d in edges:
            msg[index[d]] += contrib[index[s]]
        dangling = r[out_deg == 0].sum()
        new = (1 - damping) / n + damping * (msg + dangling / n)
        if np.abs(new - r).sum() < tol:
            return new
        r = new
    return r


def pagerank_hugegraph_oracle(
    n: int,
    edges: list[tuple[int, int]],
    index: dict[int, int],
    alpha: float = 0.15,
    l1_threshold: float = 1e-5,
    max_supersteps: int = 10,
) -> np.ndarray:
    """Direct NumPy transcription of the Java formula
    (PageRank.java:85-87 + PageRank4Master.java:94-99): teleport alpha,
    dangling mass redistribution, cumulative-rank normalization, stop
    when superstep > 1 and L1 diff <= threshold."""
    out_deg = np.zeros(n)
    for s, _ in edges:
        out_deg[index[s]] += 1
    r = np.full(n, 1.0 / n)
    cum = r.sum()
    dangling_cum = r[out_deg == 0].sum()
    for step in range(1, max_supersteps + 1):
        contrib = np.divide(r, out_deg, out=np.zeros(n), where=out_deg > 0)
        msg = np.zeros(n)
        for s, d in edges:
            msg[index[d]] += contrib[index[s]]
        new = ((dangling_cum / n + msg) * (1 - alpha) + alpha / n) / cum
        l1 = np.abs(new - r).sum()
        cum = new.sum()
        dangling_cum = new[out_deg == 0].sum()
        r = new
        if step > 1 and l1 <= l1_threshold:
            break
    return r


def wcc_oracle(vertex_ids: list[int], edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find; component id = min member id."""
    parent = {v: v for v in vertex_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    return {v: find(v) for v in vertex_ids}


def triangle_oracle(vertex_ids: list[int], edges: list[tuple[int, int]]) -> dict[int, int]:
    """Brute force per-vertex triangle counts on the undirected dedup'd
    graph."""
    und = set()
    for s, d in edges:
        if s != d:
            und.add((min(s, d), max(s, d)))
    adj = {v: set() for v in vertex_ids}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    counts = {v: 0 for v in vertex_ids}
    for a, b in und:
        common = adj[a] & adj[b]
        for c in common:
            if c > b:
                counts[a] += 1
                counts[b] += 1
                counts[c] += 1
    return counts


def lpa_java_oracle(
    vertex_ids: list[int],
    edges: list[tuple[int, int]],
    max_steps: int = 10,
) -> dict[int, int]:
    """Deterministic Java-semantics LPA (Lpa.java:48-99 with min-label
    tie-break): directed out-edge broadcast, only changed vertices
    rebroadcast, frequency over received messages."""
    labels = {v: v for v in vertex_ids}
    out = {v: [] for v in vertex_ids}
    for s, d in edges:
        out[s].append(d)
    pending = list(vertex_ids)  # compute0 broadcasts unconditionally
    for _ in range(max_steps):
        inbox: dict[int, list[int]] = {}
        for s in pending:
            for d in out[s]:
                inbox.setdefault(d, []).append(labels[s])
        pending = []
        for v, msgs in inbox.items():
            freq: dict[int, int] = {}
            for l in msgs:
                freq[l] = freq.get(l, 0) + 1
            m = max(freq.values())
            new = min(l for l, c in freq.items() if c == m)
            if new != labels[v]:
                labels[v] = new
                pending.append(v)
        if not pending:
            break
    return labels


def lpa_sync_oracle(
    vertex_ids: list[int],
    edges: list[tuple[int, int]],
    max_steps: int = 10,
) -> dict[int, int]:
    """Deterministic Vermeer LPA: in+out multiset frequency, min-label
    tie-break, halt when diff==0 or grandpa_diff==0."""
    labels = {v: v for v in vertex_ids}
    grandpa = dict(labels)
    neigh = {v: [] for v in vertex_ids}
    for s, d in edges:
        neigh[s].append(d)
        neigh[d].append(s)
    for step in range(1, max_steps + 1):
        new = {}
        for v in vertex_ids:
            freq: dict[int, int] = {}
            for u in neigh[v]:
                freq[labels[u]] = freq.get(labels[u], 0) + 1
            if not freq:
                new[v] = labels[v]
                continue
            m = max(freq.values())
            new[v] = min(l for l, c in freq.items() if c == m)
        diff = sum(1 for v in vertex_ids if new[v] != labels[v])
        gdiff = sum(1 for v in vertex_ids if new[v] != grandpa[v])
        grandpa = labels
        labels = new
        if diff == 0 or (step >= 2 and gdiff == 0):
            break
    return labels


def random_graph(n: int, m: int, seed: int) -> list[tuple[int, int]]:
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    return [(int(s), int(d)) for s, d in zip(src, dst) if s != d]
