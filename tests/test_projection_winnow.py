"""Bipartite projection, double-sweep diameter, and MOSS winnowing."""

import hashlib

import pytest

from tests.conftest import make_graph

from incubator_hugegraph_computer_spark.functions.text import winnow_fingerprints
from incubator_hugegraph_computer_spark.operators.bfs import diameter_2sweep
from incubator_hugegraph_computer_spark.operators.projection import project


def _bip(spark, rows):
    return spark.createDataFrame(rows, "g long, item long")


def test_project_counts_shared_groups(spark):
    # groups: 10 -> {1,2,3}, 20 -> {2,3}, 30 -> {3}
    pairs = _bip(spark, [(10, 1), (10, 2), (10, 3), (20, 2), (20, 3), (30, 3)])
    got = {(r["src"], r["dst"]): r["weight"] for r in project(pairs, "g", "item").collect()}
    assert got == {(1, 2): 1, (1, 3): 1, (2, 3): 2}


def test_project_dedupes_multiset_membership(spark):
    # duplicate (g, item) rows must not inflate weights
    pairs = _bip(spark, [(10, 1), (10, 1), (10, 2)])
    got = {(r["src"], r["dst"]): r["weight"] for r in project(pairs, "g", "item").collect()}
    assert got == {(1, 2): 1}


def test_project_group_size_cap(spark):
    rows = [(10, i) for i in range(1, 5)] + [(20, 1), (20, 2)]
    pairs = _bip(spark, rows)
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in project(pairs, "g", "item", max_group_size=3).collect()
    }
    # group 10 (size 4) excluded entirely; only group 20 contributes
    assert got == {(1, 2): 1}


def test_diameter_path_graph(spark):
    g = make_graph(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    row = diameter_2sweep(g).collect()[0]
    assert row["start"] == 1
    assert row["ecc_start"] == 4
    assert row["far_vertex"] == 5
    assert row["diameter_lb"] == 4


def test_diameter_directed_edges_treated_undirected(spark):
    # all edges point INTO 1; undirected view still spans the star
    g = make_graph(spark, [(2, 1), (3, 1), (4, 1)])
    row = diameter_2sweep(g).collect()[0]
    assert row["start"] == 1
    assert row["ecc_start"] == 1
    assert row["far_vertex"] == 2  # depth-1 ties broken by min id
    assert row["diameter_lb"] == 2


def _winnow_py(text, k, w):
    toks = [t for t in "".join(c if c.isalnum() else " " for c in text.lower()).split() if t]
    kg = []
    for i in range(len(toks) - k + 1):
        s = " ".join(toks[i : i + k])
        h = int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
        kg.append((i + 1, h))
    out = set()
    for s in range(len(kg) - w + 1):
        win = kg[s : s + w]
        mn = min(h for _, h in win)
        pos = max(p for p, h in win if h == mn)
        out.add((pos, mn))
    return out


WINNOW_TEXT = "the quick brown fox jumps over the lazy dog near the river bank today"


def test_winnow_matches_python_reference(spark):
    docs = spark.createDataFrame([(1, WINNOW_TEXT)], "doc_id long, text string")
    got = {(r["pos"], r["fp"]) for r in winnow_fingerprints(docs, k=4, window=4).collect()}
    assert got == _winnow_py(WINNOW_TEXT, 4, 4)
    assert got  # non-empty


def test_winnow_guarantee_shared_run_shares_fingerprint(spark):
    # two docs share a 7-token run (k + w - 1 = 7): the winnowing
    # guarantee says they MUST share at least one fingerprint hash
    shared = "alpha beta gamma delta epsilon zeta eta"
    docs = spark.createDataFrame(
        [(1, "xx yy " + shared + " zz"), (2, shared + " aa bb cc dd")],
        "doc_id long, text string",
    )
    rows = winnow_fingerprints(docs, k=4, window=4).collect()
    fps1 = {r["fp"] for r in rows if r["doc_id"] == 1}
    fps2 = {r["fp"] for r in rows if r["doc_id"] == 2}
    assert fps1 & fps2


def test_winnow_short_doc_yields_nothing(spark):
    # k-grams: 6 tokens -> 3 kgrams < window 4 -> no full window
    docs = spark.createDataFrame(
        [(1, "one two three four five six")], "doc_id long, text string"
    )
    assert winnow_fingerprints(docs, k=4, window=4).count() == 0


def _kruskal(edges):
    """(a, b, w) canonical list -> unique MSF under (w, a, b) order."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    chosen = set()
    canon = {}
    for s, d, w in edges:
        if s == d:
            continue
        a, b = min(s, d), max(s, d)
        canon[(a, b)] = min(canon.get((a, b), w), w)
    for (a, b), w in sorted(canon.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            chosen.add((a, b, w))
    return chosen


def _weighted_graph(spark, rows):
    from incubator_hugegraph_computer_spark.graph import Graph

    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    return Graph.from_edges(edges)


def test_msf_matches_kruskal_weighted(spark):
    from incubator_hugegraph_computer_spark.operators.mst import msf

    rows = [
        (1, 2, 1.0), (2, 3, 2.0), (3, 1, 3.0),  # triangle: drops (3,1)
        (3, 4, 1.0), (4, 5, 5.0), (5, 3, 4.0),  # triangle: drops (4,5)
        (10, 11, 1.0),                            # separate component
    ]
    g = _weighted_graph(spark, rows)
    got = {(r["a"], r["b"], r["w"]) for r in msf(g, weight_col="weight").collect()}
    assert got == _kruskal(rows)


def test_msf_tie_break_is_lexicographic(spark):
    from incubator_hugegraph_computer_spark.operators.mst import msf

    # all weights equal: the unique MSF under (w, a, b) = Kruskal's
    rows = [(1, 2, 1.0), (2, 3, 1.0), (3, 1, 1.0), (2, 4, 1.0), (4, 1, 1.0)]
    g = _weighted_graph(spark, rows)
    got = {(r["a"], r["b"], r["w"]) for r in msf(g, weight_col="weight").collect()}
    assert got == _kruskal(rows)


def test_msf_long_chain_merges(spark):
    from incubator_hugegraph_computer_spark.operators.mst import msf

    # increasing weights along a path force chained pointer merges
    rows = [(i, i + 1, float(i)) for i in range(1, 12)]
    g = _weighted_graph(spark, rows)
    got = {(r["a"], r["b"], r["w"]) for r in msf(g, weight_col="weight").collect()}
    assert got == _kruskal(rows)
    assert len(got) == 11  # a path IS its own spanning tree


def test_msf_unit_weights_spanning_forest(spark):
    from incubator_hugegraph_computer_spark.operators.mst import msf

    g = make_graph(spark, [(1, 2), (2, 3), (3, 1), (5, 6)], vertex_ids=[1, 2, 3, 5, 6, 9])
    rows = msf(g).collect()
    # V=6, isolated 9 contributes no edge, 2 components with edges:
    # forest edges = (3-1) + (2-1) = 3
    assert len(rows) == 3
    assert all(r["w"] == 1.0 for r in rows)


def test_msf_empty_graph(spark):
    from incubator_hugegraph_computer_spark.operators.mst import msf

    g = make_graph(spark, [(1, 1)], vertex_ids=[1, 2])  # only a self-loop
    assert msf(g).count() == 0


def _assert_proper(edges, colors):
    for s, d in edges:
        if s != d and colors[s] is not None and colors[d] is not None:
            assert colors[s] != colors[d], (s, d)


def test_coloring_is_proper_and_total(spark):
    from incubator_hugegraph_computer_spark.operators.coloring import greedy_coloring
    from tests.conftest import PRWCC_EDGES, PRWCC_VERTEX_IDS

    g = make_graph(spark, PRWCC_EDGES, PRWCC_VERTEX_IDS)
    colors = {r["id"]: r["color"] for r in greedy_coloring(g).collect()}
    assert set(colors) == set(PRWCC_VERTEX_IDS)
    assert all(c is not None for c in colors.values())
    _assert_proper(PRWCC_EDGES, colors)
    # isolated vertex has no constraints -> greedy gives it color 0
    assert colors[20] == 0


def test_coloring_star_one_round_for_spokes(spark):
    from incubator_hugegraph_computer_spark.operators.coloring import greedy_coloring

    # star: spokes are pairwise non-adjacent; with 2 rounds everything
    # must be colored (hub and spokes resolve in <= 2 rounds) and use
    # exactly 2 colors
    star = [(0, i) for i in range(1, 9)]
    colors = {r["id"]: r["color"] for r in greedy_coloring(make_graph(spark, star), max_rounds=2).collect()}
    assert all(c is not None for c in colors.values())
    _assert_proper(star, colors)
    assert len(set(colors.values())) == 2


def test_coloring_budget_leaves_nulls(spark):
    from incubator_hugegraph_computer_spark.operators.coloring import greedy_coloring

    # K3: three mutually-adjacent vertices need 3 rounds (one winner
    # per round); with max_rounds=1 exactly one vertex is colored
    k3 = [(1, 2), (2, 3), (3, 1)]
    colors = {r["id"]: r["color"] for r in greedy_coloring(make_graph(spark, k3), max_rounds=1).collect()}
    assert sum(1 for c in colors.values() if c is None) == 2
    assert sum(1 for c in colors.values() if c == 0) == 1


def test_coloring_deterministic(spark):
    from incubator_hugegraph_computer_spark.operators.coloring import greedy_coloring
    from tests.conftest import PRWCC_EDGES, PRWCC_VERTEX_IDS

    g = make_graph(spark, PRWCC_EDGES, PRWCC_VERTEX_IDS)
    a = sorted((r["id"], r["color"]) for r in greedy_coloring(g).collect())
    b = sorted((r["id"], r["color"]) for r in greedy_coloring(g).collect())
    assert a == b
