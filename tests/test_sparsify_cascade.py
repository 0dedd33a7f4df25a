"""Local-similarity sparsifier + threshold cascade — hand fixtures."""

from pyspark.sql import functions as F

from incubator_hugegraph_computer_spark.graph import Graph
from incubator_hugegraph_computer_spark.operators.cascade import threshold_cascade
from incubator_hugegraph_computer_spark.operators.sparsify import local_sparsify


def _g(spark, edges):
    return Graph.from_edges(
        spark.createDataFrame(edges, "src long, dst long"), num_partitions=4
    )


def test_sparsify_prefers_embedded_edges(spark):
    # triangle 1-2-3 plus pendant 1-4: vertex 1 has deg 3 -> keeps
    # ceil(3^0.5)=2 edges, ranked by jaccard; triangle edges share a
    # common neighbor (jaccard > 0), pendant edge has none (jaccard 0)
    g = _g(spark, [(1, 2), (2, 3), (3, 1), (1, 4)])
    kept = {(r["a"], r["b"]): r["jaccard"] for r in local_sparsify(g).collect()}
    assert (1, 2) in kept and (1, 3) in kept and (2, 3) in kept
    # pendant (1,4) survives anyway: deg(4)=1 -> vertex 4 keeps its one
    # edge (the union rule protects leaves from disconnection)
    assert (1, 4) in kept and kept[(1, 4)] == 0.0
    assert kept[(1, 2)] > 0.0


def test_sparsify_drops_low_similarity_at_hub(spark):
    # hub 0 in two triangles (1,2) and (3,4) plus 4 pendant spokes:
    # deg(0)=8 -> hub keeps ceil(8^0.5)=3; pendant spokes lose the
    # hub's vote AND their own (deg 1, rank by sim: their only edge is
    # rank 1) — union rule keeps them. Check the triangle edges outrank
    # spokes on the hub's list via jaccard ordering.
    edges = [(0, 1), (0, 2), (1, 2), (0, 3), (0, 4), (3, 4),
             (0, 5), (0, 6), (0, 7), (0, 8)]
    g = _g(spark, edges)
    out = local_sparsify(g)
    kept = {(r["a"], r["b"]): r["jaccard"] for r in out.collect()}
    # triangle closures (1,2) and (3,4) always kept, with sim 1/3
    assert abs(kept[(1, 2)] - round(1 / 3, 6)) < 1e-9
    assert abs(kept[(3, 4)] - round(1 / 3, 6)) < 1e-9


def test_cascade_rounds_and_threshold(spark):
    # seeds {1,2}; 3 needs k=2 in-nbrs (1->3, 2->3) -> round 1;
    # 4 has in-edges from 3 and 1 -> round 2 (3 activates first);
    # 5 has only one in-edge -> never activates at k=2
    g = _g(spark, [(1, 3), (2, 3), (3, 4), (1, 4), (4, 5)])
    seeds = g.vertices.where(F.col("id").isin(1, 2)).select("id")
    rows = {r["id"]: r["round"] for r in threshold_cascade(g, seeds, k=2).collect()}
    assert rows == {1: 0, 2: 0, 3: 1, 4: 2}


def test_cascade_round_budget_truncates(spark):
    # chain of pairs: each stage needs both feeders; budget 1 stops early
    g = _g(spark, [(1, 3), (2, 3), (3, 4), (1, 4), (4, 5), (3, 5)])
    seeds = g.vertices.where(F.col("id").isin(1, 2)).select("id")
    rows = {r["id"]: r["round"]
            for r in threshold_cascade(g, seeds, k=2, max_rounds=1).collect()}
    assert rows == {1: 0, 2: 0, 3: 1}
