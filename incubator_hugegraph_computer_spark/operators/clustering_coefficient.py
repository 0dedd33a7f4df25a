"""Local clustering coefficient — triangle counts / degree pairs.

Reference: ``computer-algorithm/.../community/cc/
ClusteringCoefficient.java:44-81`` (extends TriangleCount; at output
cc(v) = 2·T(v) / (deg·(deg−1)) over the undirected deduplicated graph)
and ``vermeer/algorithms/clustering_coeffcient.go``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from incubator_hugegraph_computer_spark.graph import Graph
from incubator_hugegraph_computer_spark.operators.triangle_count import (
    triangle_count,
    undirected_edges,
)


def clustering_coefficient(graph: Graph) -> DataFrame:
    """(id, coefficient) — 0.0 when degree < 2."""
    tri = triangle_count(graph)
    und = undirected_edges(graph.edges)
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    return (
        tri.join(deg, "id", "left")
        .select(
            "id",
            F.when(
                F.coalesce(F.col("deg"), F.lit(0)) >= 2,
                2.0 * F.col("triangles") / (F.col("deg") * (F.col("deg") - 1)),
            )
            .otherwise(0.0)
            .alias("coefficient"),
        )
    )
