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


def test_triangle_count_sampled(spark):
    """DOULION: the deterministic md5 coin replays in Python — the
    sampled edge set, triangle count, and scaled estimate all match a
    brute-force replay exactly."""
    import hashlib
    from itertools import combinations

    import pytest

    from tests.conftest import make_graph
    from incubator_hugegraph_computer_spark.operators.triangle_count import (
        triangle_count_sampled,
    )

    edges = [(i, (i * 7 + 3) % 30) for i in range(90)] + [(i, i + 1) for i in range(29)]
    edges = [(s, d) for s, d in edges if s != d]
    und = {(min(s, d), max(s, d)) for s, d in edges}
    g = make_graph(spark, edges)

    thr, seed = "80", 7  # p = 128/256
    samp = {
        (a, b) for a, b in und
        if hashlib.md5(f"{a}:{b}:{seed}".encode()).hexdigest() < thr
    }
    tri = sum(
        1 for a, b, c in combinations(sorted({v for e in samp for v in e}), 3)
        if {(a, b), (b, c), (a, c)} <= samp
    )
    out = triangle_count_sampled(g, threshold_hex=thr, seed=seed).collect()[0]
    assert out["sampled_edges"] == len(samp)
    assert out["sampled_triangles"] == tri
    assert out["est_triangles"] == pytest.approx(tri * (256.0 / 128.0) ** 3, abs=1e-6)
    # determinism: same seed -> identical row
    assert out == triangle_count_sampled(g, threshold_hex=thr, seed=seed).collect()[0]
