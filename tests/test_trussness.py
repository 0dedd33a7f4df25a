"""Full truss decomposition (per-edge max trussness)."""

from itertools import combinations

from conftest import make_graph

from incubator_hugegraph_computer_spark.operators.ktruss import trussness

# 5-clique {0..4}  +  pendant edge 4-5  +  triangle {5,6,7}
CLIQUE = list(combinations(range(5), 2))
EDGES = CLIQUE + [(4, 5), (5, 6), (5, 7), (6, 7)]


def test_trussness_levels(spark):
    g = make_graph(spark, EDGES, vertex_ids=range(8))
    out = {(r["a"], r["b"]): r["trussness"] for r in trussness(g, k_max=8).collect()}
    assert len(out) == len(EDGES)
    for a, b in CLIQUE:
        assert out[(a, b)] == 5, (a, b)  # every 5-clique edge is in the 5-truss
    assert out[(4, 5)] == 2  # triangle-free edge: trivially 2-truss only
    for e in [(5, 6), (5, 7), (6, 7)]:
        assert out[e] == 3, e


def test_trussness_cap_binds(spark):
    """With k_max below the true maximum, survivors report the cap."""
    g = make_graph(spark, EDGES, vertex_ids=range(8))
    out = {(r["a"], r["b"]): r["trussness"] for r in trussness(g, k_max=4).collect()}
    for a, b in CLIQUE:
        assert out[(a, b)] == 4
    assert out[(4, 5)] == 2
    assert out[(5, 6)] == 3


def test_trussness_no_triangles(spark):
    g = make_graph(spark, [(0, 1), (1, 2), (2, 3)], vertex_ids=range(4))
    out = trussness(g, k_max=6).collect()
    assert {r["trussness"] for r in out} == {2}
    assert len(out) == 3
