"""Landmark (pivot) distances — the scalable distance-oracle primitive.

Beyond-reference addition (SURVEY.md §2.10): exact all-pairs distances
are O(V²) and dead at web scale; the standard substitute (Potamias et
al., CIKM'09 "Fast shortest path distance estimation in large
networks") stores each vertex's hop distance to a small landmark set L
and estimates d(u,v) ≲ min_{l∈L} d(u,l) + d(l,v) (triangle-inequality
upper bound; exact when some landmark lies on a shortest u-v path).

Spark shape: ONE multi-source BFS over the landmark set (the shared
kernel behind closeness/harmonic — state is O(V·|L|) pairs, the whole
point of keeping |L| small), emitted in LONG format (id, landmark,
dist) — the layout that joins/aggregates cleanly at scale instead of a
|L|-wide pivot. Estimation is a self-join on the landmark column with
a min-aggregate — two shuffles, no per-pair BFS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from incubator_hugegraph_computer_spark.graph import Graph
from incubator_hugegraph_computer_spark.operators.closeness import multi_source_bfs


def landmark_distances(
    graph: Graph, landmarks: DataFrame, max_depth: int = 30
) -> DataFrame:
    """(id, landmark, dist) — minimal hop count from each landmark to
    each vertex it reaches (directed, along ``graph.edges``; pass
    ``graph.symmetrized()`` for undirected distances). Rows exist only
    for reached pairs; dist 0 rows (the landmarks themselves) included."""
    visited = multi_source_bfs(graph, landmarks.select("id"), max_depth=max_depth)
    return visited.select(
        F.col("v").alias("id"), F.col("source").alias("landmark"), "dist"
    )


def estimate_distance(
    table: DataFrame, pairs: DataFrame
) -> DataFrame:
    """Upper-bound estimate for each (u, v) pair from an UNDIRECTED
    landmark table (build it over ``graph.symmetrized()`` — the table
    stores d(l,·), and the triangle bound d(u,v) ≤ d(u,l)+d(l,v) needs
    d(u,l) = d(l,u)): est = min over landmarks reaching both of
    d(l,u)+d(l,v); pairs no landmark covers are absent. Exact whenever
    some landmark lies on a shortest u-v path. One join per side keyed
    on the landmark column."""
    lu = table.select(
        F.col("id").alias("u"), "landmark", F.col("dist").alias("_du")
    )
    lv = table.select(
        F.col("id").alias("v"), "landmark", F.col("dist").alias("_dv")
    )
    return (
        pairs.join(lu, "u")
        .join(lv, ["v", "landmark"])
        .groupBy("u", "v")
        .agg(F.min(F.col("_du") + F.col("_dv")).alias("est_dist"))
    )
