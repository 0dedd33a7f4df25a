"""Bridges + 2-edge-connected components — exact fixtures and a
random-graph cross-check against a brute-force bridge definition."""

import itertools

from conftest import make_graph

from incubator_hugegraph_computer_spark.operators.bridges import (
    bridges,
    two_edge_components,
)

# two triangles joined by one edge, plus a pendant vertex:
#   {1,2,3} triangle — 3-4 — {4,5,6} triangle ; 1-7 pendant
BOWTIE = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4), (1, 7)]


def test_bridges_bowtie(spark):
    g = make_graph(spark, BOWTIE, vertex_ids=range(1, 8))
    got = sorted((r["a"], r["b"]) for r in bridges(g).collect())
    assert got == [(1, 7), (3, 4)]


def test_two_edge_components_bowtie(spark):
    g = make_graph(spark, BOWTIE, vertex_ids=range(1, 8))
    comp = {r["id"]: r["comp2"] for r in two_edge_components(g).collect()}
    assert comp[1] == comp[2] == comp[3]
    assert comp[4] == comp[5] == comp[6]
    assert comp[1] != comp[4]
    # the pendant vertex is its own 2ecc
    assert comp[7] not in (comp[1], comp[4])
    # labels are component minima
    assert comp[1] == 1 and comp[4] == 4 and comp[7] == 7


def test_bridges_tree_all_edges(spark):
    # a path graph: every edge is a bridge
    path = [(i, i + 1) for i in range(6)]
    g = make_graph(spark, path, vertex_ids=range(7))
    got = sorted((r["a"], r["b"]) for r in bridges(g).collect())
    assert got == sorted(path)


def test_bridges_cycle_none(spark):
    cyc = [(i, (i + 1) % 5) for i in range(5)]
    g = make_graph(spark, cyc, vertex_ids=range(5))
    assert bridges(g).count() == 0


def _brute_bridges(n, und):
    """An undirected edge is a bridge iff removing it disconnects its
    endpoints (pure-python reachability)."""

    def connected(u, v, edges):
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        seen, stack = {u}, [u]
        while stack:
            x = stack.pop()
            if x == v:
                return True
            for y in adj.get(x, ()):
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        return False

    out = []
    for e in und:
        rest = [x for x in und if x != e]
        if not connected(e[0], e[1], rest):
            out.append(e)
    return sorted(out)


def test_bridges_random_cross_check(spark):
    # deterministic pseudo-random sparse graph (directed input with
    # some reciprocated edges — exercises the undirected collapse)
    import random

    rnd = random.Random(1234)
    n = 24
    edge_list = set()
    for _ in range(30):
        a, b = rnd.randrange(n), rnd.randrange(n)
        if a != b:
            edge_list.add((a, b))
    und = sorted({(min(a, b), max(a, b)) for a, b in edge_list})
    g = make_graph(spark, sorted(edge_list), vertex_ids=range(n))
    got = sorted((r["a"], r["b"]) for r in bridges(g).collect())
    assert got == _brute_bridges(n, und)


def test_two_edge_components_match_bridge_removal(spark):
    import random

    rnd = random.Random(99)
    n = 18
    edge_list = {(rnd.randrange(n), rnd.randrange(n)) for _ in range(26)}
    edge_list = sorted((a, b) for a, b in edge_list if a != b)
    und = sorted({(min(a, b), max(a, b)) for a, b in edge_list})
    g = make_graph(spark, edge_list, vertex_ids=range(n))
    br = set(_brute_bridges(n, und))
    kept = [e for e in und if e not in br]
    # python union-find over kept edges
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in kept:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {v: find(v) for v in range(n)}
    got = {r["id"]: r["comp2"] for r in two_edge_components(g).collect()}
    # same partition (labels are min ids on both sides)
    assert got == expected
