"""Leiden-style connectivity refinement."""

from conftest import make_graph

from pyspark.sql import functions as F

from incubator_hugegraph_computer_spark.operators.leiden import leiden, refine_connected


def test_refine_splits_disconnected_community(spark):
    """Two disjoint triangles forced into one community must split."""
    tri_a = [(0, 1), (1, 2), (2, 0)]
    tri_b = [(3, 4), (4, 5), (5, 3)]
    g = make_graph(spark, tri_a + tri_b, vertex_ids=range(6))
    bad = g.vertices.select("id", F.lit(0).alias("community"))
    out = {r["id"]: r["community"] for r in refine_connected(g, bad).collect()}
    assert out == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}


def test_leiden_communities_are_connected(spark):
    """End-to-end: every leiden community induces a connected subgraph
    (idempotence of the refinement), and the partition is canonical."""
    cl_a = [(a, b) for a in range(4) for b in range(4) if a < b]
    cl_b = [(a, b) for a in range(4, 8) for b in range(4, 8) if a < b]
    g = make_graph(spark, cl_a + cl_b + [(3, 4)], vertex_ids=range(8))
    asn = leiden(g, max_levels=3, max_inner=5)
    rows = asn.collect()
    by_id = {r["id"]: r["community"] for r in rows}
    assert len(by_id) == 8
    # min-member canonicalization
    for c in set(by_id.values()):
        members = [v for v, cc in by_id.items() if cc == c]
        assert min(members) == c
    # refinement is a fixpoint of itself
    again = {r["id"]: r["community"] for r in refine_connected(g, asn).collect()}
    assert again == by_id


def test_refine_keeps_connected_partition(spark):
    """A partition whose communities are already connected is unchanged
    (modulo min-member canonicalization)."""
    path = [(0, 1), (1, 2), (3, 4)]
    g = make_graph(spark, path, vertex_ids=range(5))
    asn = g.vertices.select(
        "id", F.when(F.col("id") <= 2, F.lit(0)).otherwise(F.lit(3)).alias("community")
    )
    out = {r["id"]: r["community"] for r in refine_connected(g, asn).collect()}
    assert out == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3}
