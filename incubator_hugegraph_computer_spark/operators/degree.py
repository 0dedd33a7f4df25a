"""Degree centrality — single-pass aggregation.

Java reference: value = number of out-edges, or Σ of a numeric edge
weight property with missing→1.0
(``computer-algorithm/.../centrality/degree/DegreeCentrality.java:35-124``).
Vermeer adds a direction parameter in/out/both
(``vermeer/algorithms/degree.go:60-115``) — adopted here.

One groupBy; map-side partial aggregation makes this a single cheap
shuffle at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from incubator_hugegraph_computer_spark.graph import Graph


def degree_centrality(
    graph: Graph, direction: str = "out", weight_col: str | None = None
) -> DataFrame:
    """(id, degree) — degree double when weighted (missing weights → 1.0,
    DegreeCentrality.java:98-104), long otherwise."""
    edges = graph.edges
    parts = []
    if direction in ("out", "both"):
        parts.append(edges.select(F.col("src").alias("id"), *( [weight_col] if weight_col else [] )))
    if direction in ("in", "both"):
        parts.append(edges.select(F.col("dst").alias("id"), *( [weight_col] if weight_col else [] )))
    if not parts:
        raise ValueError(f"direction must be in/out/both, got {direction!r}")
    ids = parts[0] if len(parts) == 1 else parts[0].unionAll(parts[1])
    if weight_col:
        agg = F.sum(F.coalesce(F.col(weight_col).cast("double"), F.lit(1.0))).alias("degree")
    else:
        agg = F.count(F.lit(1)).alias("degree")
    deg = ids.groupBy("id").agg(agg)
    zero = F.lit(0.0) if weight_col else F.lit(0)
    return (
        graph.vertices.select("id")
        .join(deg, "id", "left")
        .select("id", F.coalesce("degree", zero).alias("degree"))
    )
