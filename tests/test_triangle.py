from tests.conftest import TRI_EDGES, TRI_VERTICES, make_graph
from tests.oracles import random_graph, triangle_oracle

from incubator_hugegraph_computer_spark.operators.triangle_count import (
    total_triangles,
    triangle_count,
)


def test_reference_fixture_exact(spark):
    """TriangleCountTest.java:42-46 expected {A:2,B:1,C:3,D:2,E:1}."""
    edges = [(TRI_VERTICES[a], TRI_VERTICES[b]) for a, b in TRI_EDGES]
    g = make_graph(spark, edges, vertex_ids=TRI_VERTICES.values())
    got = {r["id"]: r["triangles"] for r in triangle_count(g).collect()}
    assert got == {0: 2, 1: 1, 2: 3, 3: 2, 4: 1}
    assert total_triangles(g) == 3


def test_random_matches_bruteforce(spark):
    edges = random_graph(30, 160, seed=5)
    ids = list(range(30))
    g = make_graph(spark, edges, vertex_ids=ids)
    got = {r["id"]: r["triangles"] for r in triangle_count(g).collect()}
    assert got == triangle_oracle(ids, edges)


def test_self_loops_and_mutual_edges_ignored(spark):
    edges = [(0, 0), (0, 1), (1, 0), (1, 2), (2, 0)]
    g = make_graph(spark, edges, vertex_ids=[0, 1, 2])
    got = {r["id"]: r["triangles"] for r in triangle_count(g).collect()}
    assert got == {0: 1, 1: 1, 2: 1}
