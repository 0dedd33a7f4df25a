"""K-core decomposition — iterative peeling, then optional WCC phase.

Reference: ``computer-algorithm/.../community/kcore/Kcore.java:31-122``
(phase 1: delete vertices with degree < k, k default 3; phase 2: WCC
over the surviving core) and ``vermeer/algorithms/kcore.go`` (peeling
with ``kcore.degree_k``).

Spark shape: each peel round recomputes degrees over surviving edges —
one groupBy per round; survivors shrink monotonically so AQE coalesces
late rounds. ``max_rounds`` fixes the round count for oracle
comparability (pass None to run to fixpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from incubator_hugegraph_computer_spark.graph import Graph


def kcore_vertices(
    graph: Graph, k: int = 3, max_rounds: int | None = None
) -> DataFrame:
    """(id, degree) of vertices surviving k-core peeling on the
    undirected graph. Runs to fixpoint unless max_rounds is set."""
    edges = graph.symmetrized().edges.persist()
    rounds = 0
    while True:
        deg = edges.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("degree"))
        survivors = deg.where(F.col("degree") >= k).persist()
        n_edges = edges.count()
        keep_src = survivors.select(F.col("id").alias("src"))
        keep_dst = survivors.select(F.col("id").alias("dst"))
        new_edges = edges.join(keep_src, "src", "left_semi").join(
            keep_dst, "dst", "left_semi"
        )
        new_edges = new_edges.localCheckpoint(eager=True)
        edges.unpersist()
        edges = new_edges
        rounds += 1
        stable = edges.count() == n_edges and rounds > 1
        if stable or (max_rounds is not None and rounds >= max_rounds):
            break
    return (
        edges.groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("degree"))
        .where(F.col("degree") >= k)
    )


def kcore(graph: Graph, k: int = 3, max_rounds: int | None = None) -> DataFrame:
    """(id, core_comp) — surviving k-core vertices labelled by the WCC
    of the core subgraph (Kcore.java phase 2: min-id propagation)."""
    from incubator_hugegraph_computer_spark.operators.wcc import wcc

    core = kcore_vertices(graph, k, max_rounds).select("id").persist()
    sym = graph.symmetrized().edges
    core_edges = sym.join(core.select(F.col("id").alias("src")), "src", "left_semi").join(
        core.select(F.col("id").alias("dst")), "dst", "left_semi"
    )
    comp = wcc(Graph(core, core_edges, graph.num_partitions))
    return comp.select("id", F.col("comp").alias("core_comp"))
