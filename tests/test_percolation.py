"""3- and 4-clique percolation — overlap semantics on exact fixtures."""

from itertools import combinations

from conftest import make_graph

from incubator_hugegraph_computer_spark.operators.percolation import (
    clique_percolation3,
    clique_percolation4,
    percolation_summary,
)

# T1 {1,2,3} and T2 {2,3,4} share edge (2,3) -> ONE community;
# T3 {4,5,6} shares only vertex 4 with T2 -> SEPARATE community.
# Vertex 4 overlaps both.
EDGES = [(1, 2), (2, 3), (1, 3), (2, 4), (3, 4), (4, 5), (5, 6), (4, 6)]


def test_percolation_overlap(spark):
    g = make_graph(spark, EDGES, vertex_ids=range(7))
    rows = sorted((r["id"], r["community"]) for r in clique_percolation3(g).collect())
    m = 7  # max_id + 1
    c1 = 1 * m + 2  # min edge key of {T1 ∪ T2}: edge (1,2)
    c2 = 4 * m + 5  # min edge key of T3: edge (4,5)
    assert rows == sorted(
        [(1, c1), (2, c1), (3, c1), (4, c1), (4, c2), (5, c2), (6, c2)]
    )


def test_percolation_no_triangles(spark):
    g = make_graph(spark, [(0, 1), (1, 2), (2, 3)], vertex_ids=range(4))
    assert clique_percolation3(g).count() == 0


def test_percolation_summary(spark):
    g = make_graph(spark, EDGES, vertex_ids=range(7))
    rows = {r["community"]: r["n_vertices"] for r in percolation_summary(g).collect()}
    assert sorted(rows.values()) == [3, 4]


def test_percolation4_shared_triangle(spark):
    # K4 on {1,2,3,4} and K4 on {2,3,4,5} share triangle {2,3,4} -> ONE
    # community covering 1..5; K4 on {6,7,8,9} is its own community.
    # Community label = min triangle key ((a*m)+b)*m+c with m=10, so the
    # labels read as decimal digit triples: 123 and 678.
    edges = (
        list(combinations([1, 2, 3, 4], 2))
        + list(combinations([2, 3, 4, 5], 2))
        + list(combinations([6, 7, 8, 9], 2))
    )
    g = make_graph(spark, edges, vertex_ids=range(10))
    rows = sorted((r["id"], r["community"]) for r in clique_percolation4(g).collect())
    assert rows == sorted(
        [(i, 123) for i in (1, 2, 3, 4, 5)] + [(i, 678) for i in (6, 7, 8, 9)]
    )


def test_percolation4_triangle_only_graph_empty(spark):
    # a lone triangle has no 4-clique -> no membership rows
    g = make_graph(spark, [(0, 1), (1, 2), (0, 2)], vertex_ids=range(3))
    assert clique_percolation4(g).count() == 0


def test_percolation4_stricter_than_k3(spark):
    # two K4s glued on one EDGE {3,4}: k=3 percolation merges them (the
    # shared edge chains their triangles); k=4 keeps them apart (no
    # shared TRIANGLE) — the stricter-overlap contract of higher k.
    edges = sorted(
        set(list(combinations([1, 2, 3, 4], 2)) + list(combinations([3, 4, 5, 6], 2)))
    )
    g = make_graph(spark, edges, vertex_ids=range(7))
    c3 = {r["community"] for r in clique_percolation3(g).collect()}
    c4 = {r["community"] for r in clique_percolation4(g).collect()}
    assert len(c3) == 1
    assert len(c4) == 2


def test_percolation_single_community_chain(spark):
    # chained triangles 0-1-2, 1-2-3, 2-3-4 all share edges -> one community
    edges = [(0, 1), (1, 2), (0, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    g = make_graph(spark, edges, vertex_ids=range(5))
    rows = {(r["id"], r["community"]) for r in clique_percolation3(g).collect()}
    comms = {c for _, c in rows}
    assert len(comms) == 1
    assert {i for i, _ in rows} == {0, 1, 2, 3, 4}
