"""Rings (directed cycle) detection — canonical path extension.

Reference: ``computer-algorithm/.../path/rings/RingsDetection.java:30-114``:
superstep 0 every vertex sends path [self] to out-neighbors with id ≥
its own; a path extends through vertices not already on it; a ring is
recorded at its **smallest** vertex when the path returns to its start.
(The filtered variant ``rings/filter/RingsDetectionWithFilter.java``
adds property predicates — exposed here as optional edge/vertex filter
expressions.)

So every directed cycle is enumerated exactly once, anchored at its
minimum vertex. Path containment uses an array column +
``array_contains`` — all JVM expressions. Cycle enumeration is
exponential in general; ``max_length`` bounds the search (the reference
bounds it by superstep budget, identical effect).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from incubator_hugegraph_computer_spark.graph import Graph


def rings(
    graph: Graph,
    max_length: int = 6,
    edge_filter: Column | None = None,
    vertex_filter: Column | None = None,
) -> DataFrame:
    """(start, path array<long>) — one row per directed cycle of length
    ≤ max_length; start = min(path)."""
    # EdgeFrequency.SINGLE dedup + self-loop drop (parallel edges would
    # enumerate the same cycle twice; self-cycles are degenerate).
    edges = graph.edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    if edge_filter is not None:
        edges = edges.where(edge_filter)
    verts = graph.vertices.select("id")
    if vertex_filter is not None:
        verts = verts.where(vertex_filter)
        keep = verts.select(F.col("id").alias("src"))
        edges = edges.join(keep, "src", "left_semi").join(
            verts.select(F.col("id").alias("dst")), "dst", "left_semi"
        )
    edges = edges.persist()

    frontier = verts.select(
        F.col("id").alias("start"),
        F.col("id").alias("current"),
        F.array(F.col("id")).alias("path"),
    ).persist()
    found = []
    for _ in range(1, max_length + 1):
        ext = frontier.join(edges, frontier.current == edges.src)
        closed = ext.where(F.col("dst") == F.col("start")).select("start", "path")
        found.append(closed.localCheckpoint(eager=True))
        nxt = (
            ext.where(
                (F.col("dst") > F.col("start")) & ~F.array_contains(F.col("path"), F.col("dst"))
            )
            .select(
                "start",
                F.col("dst").alias("current"),
                F.concat(F.col("path"), F.array(F.col("dst"))).alias("path"),
            )
            .localCheckpoint(eager=True)
        )
        frontier.unpersist()
        if nxt.isEmpty():
            frontier = nxt
            break
        frontier = nxt.persist()
    out = found[0]
    for f in found[1:]:
        out = out.unionAll(f)
    return out


def cycle_detection(
    graph: Graph,
    min_length: int = 1,
    max_length: int = 6,
    mode: str = "all",
    limit: int | None = None,
    edge_filter: Column | None = None,
    vertex_filter: Column | None = None,
) -> DataFrame:
    """Vermeer's ``cycle_detection`` (vermeer/algorithms/cycle_detection.go:55-118):
    bounded directed-cycle search with ``cycle.min_length`` /
    ``cycle.max_length`` and three output modes —

    - ``all``:     (start, path) every cycle in the length band
    - ``limit``:   at most ``limit`` cycles per anchor vertex
      (deterministic: shortest, then lexicographically smallest, where
      Vermeer keeps the first found)
    - ``boolean``: (id, in_cycle 0/1) per vertex — lies on any cycle

    Property filters (``filter.vertex_expr`` / ``filter.edge_expr``)
    map to the same Column predicates as the filtered rings variant.
    """
    r = rings(graph, max_length, edge_filter, vertex_filter).where(
        F.size("path") >= min_length
    )
    if mode == "boolean":
        members = (
            r.select(F.explode("path").alias("id"))
            .distinct()
            .withColumn("in_cycle", F.lit(1))
        )
        return (
            graph.vertices.select("id")
            .join(members, "id", "left")
            .select("id", F.coalesce("in_cycle", F.lit(0)).alias("in_cycle"))
        )
    if mode == "limit":
        if not limit:
            raise ValueError("mode='limit' requires limit (cycle.max_cycles)")
        w = Window.partitionBy("start").orderBy(F.size("path"), F.col("path"))
        return (
            r.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= limit)
            .drop("__rn")
        )
    if mode != "all":
        raise ValueError("cycle detection mode must be 'all', 'limit', 'boolean'")
    return r


def ring_counts(graph: Graph, max_length: int = 6) -> DataFrame:
    """(start, n_rings) per vertex that anchors at least one cycle."""
    r = rings(graph, max_length)
    return r.groupBy("start").agg(F.count(F.lit(1)).alias("n_rings"))
