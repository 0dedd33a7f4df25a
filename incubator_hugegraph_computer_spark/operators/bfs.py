"""BFS depth / k-hop neighborhood (Vermeer ``kout`` and ``depth``).

Reference: ``vermeer/algorithms/kout.go`` (k-hop neighborhood size from
``kout.source``) and ``vermeer/algorithms/depth.go`` (BFS depth per
vertex). Both are unweighted SSSP specializations; expressed here over
the shared frontier engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from incubator_hugegraph_computer_spark.graph import Graph
from incubator_hugegraph_computer_spark.operators.sssp import sssp


def bfs_depth(
    graph: Graph, source: int, max_depth: int = 100, **engine_kwargs
) -> DataFrame:
    """(id, depth) — hop distance from source along out-edges; vertices
    unreachable within max_depth omitted."""
    d = sssp(graph, source, weight_col=None, max_supersteps=max_depth, **engine_kwargs)
    return d.select("id", F.col("dist").cast("long").alias("depth"))


def kout(graph: Graph, source: int, k: int) -> DataFrame:
    """Single row (source, kout_size): number of distinct vertices within
    k hops of source, excluding source itself (vermeer kout.go:72)."""
    d = bfs_depth(graph, source, max_depth=k)
    n = d.where((F.col("depth") >= 1) & (F.col("depth") <= k)).count()
    return graph.spark.createDataFrame(
        [(source, n)], "source long, kout_size long"
    )
