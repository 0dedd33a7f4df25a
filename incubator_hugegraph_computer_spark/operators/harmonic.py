"""Harmonic centrality + Wasserman–Faust closeness.

Beyond-reference link-analysis surface (SURVEY.md §2.10): the
reference's ClosenessCentrality (``computer-algorithm/.../centrality/
closeness/ClosenessCentrality.java:35-166``) accumulates Σ 1/dist at
the RECEIVING vertex (in-direction). Harmonic centrality is the
textbook out-direction dual — h(u) = Σ_{v reachable from u} 1/d(u,v) —
well-defined on disconnected digraphs (Boldi & Vigna, "Axioms for
Centrality", 2014), plus the Wasserman–Faust normalized closeness
wf(u) = ((r-1)/Σd) · ((r-1)/(n-1)) with r = |reachable(u)| incl. u.

Spark shape: the same layered multi-source BFS kernel as closeness
(``multi_source_bfs`` — (v, source, dist) pairs, left-anti dedup per
level), aggregated by SOURCE instead of by receiver. The vertex count
n enters the plan as a broadcast one-row join, not a driver collect,
so the whole job is one lazy plan. State is O(reached pairs): sample
sources (``sample_rate``) at scale exactly as closeness does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from incubator_hugegraph_computer_spark.graph import Graph
from incubator_hugegraph_computer_spark.operators.closeness import multi_source_bfs


def harmonic(
    graph: Graph,
    sources: DataFrame | None = None,
    max_depth: int = 30,
    sample_rate: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """(id, harmonic, wf_closeness) per SOURCE vertex.

    - ``harmonic``: Σ 1/d(u, v) over v ≠ u reachable from u (0.0 for
      sinks that reach nothing).
    - ``wf_closeness``: Wasserman–Faust ((r-1)/Σd) · ((r-1)/(n-1));
      0.0 when r ≤ 1 or n ≤ 1.

    When ``sources`` is given, only those vertices are scored (the
    sampled-estimator path); n stays the FULL vertex count.
    """
    verts = graph.vertices.select("id")
    if sources is None:
        sources = verts
        if sample_rate < 1.0:
            sources = sources.where(
                F.pmod(F.hash(F.col("id"), F.lit(seed)), F.lit(1_000_000))
                < int(sample_rate * 1_000_000)
            )
    visited = multi_source_bfs(graph, sources, max_depth=max_depth, seed=seed)
    per_src = (
        visited.where(F.col("dist") > 0)
        .groupBy(F.col("source").alias("id"))
        .agg(
            F.sum(1.0 / F.col("dist")).alias("harmonic"),
            F.sum("dist").alias("_sumd"),
            F.count(F.lit(1)).alias("_r1"),  # reached, excluding self
        )
    )
    # scalar-in-plan: one-row broadcast BNLJ (the build side is a global
    # aggregate — exactly one row, the audit tool recognizes this shape)
    n_row = verts.agg(F.count(F.lit(1)).alias("_n"))
    return (
        sources.join(per_src, "id", "left")
        .crossJoin(F.broadcast(n_row))
        .select(
            "id",
            F.coalesce("harmonic", F.lit(0.0)).alias("harmonic"),
            F.when(
                (F.col("_r1") > 0) & (F.col("_n") > 1),
                (F.col("_r1") / F.col("_sumd"))
                * (F.col("_r1") / (F.col("_n") - 1)),
            )
            .otherwise(0.0)
            .alias("wf_closeness"),
        )
    )


def global_efficiency(
    graph: Graph,
    sources: DataFrame | None = None,
    max_depth: int = 30,
) -> DataFrame:
    """One row (n_sources, n_vertices, efficiency): Latora–Marchiori
    global efficiency E = mean over source u of Σ_v 1/d(u,v) / (n-1),
    with unreachable pairs contributing 0 (directed distances along
    out-edges, same kernel as ``harmonic``).

    With ``sources`` given (or sampled upstream) this is the standard
    sampled estimator — the per-source mean is unbiased for the full
    ordered-pair mean when sources are chosen independently of
    reachability. Physical shape: one multi-source BFS (shared with
    harmonic/closeness) + two scalar aggregates; state O(reached
    pairs), the only knob that matters at web scale is |sources|."""
    h = harmonic(graph, sources=sources, max_depth=max_depth)
    n_row = graph.vertices.agg(F.count(F.lit(1)).alias("_n"))
    return (
        h.agg(
            F.count(F.lit(1)).alias("n_sources"),
            F.sum("harmonic").alias("_sumh"),
        )
        .crossJoin(F.broadcast(n_row))
        .select(
            "n_sources",
            F.col("_n").alias("n_vertices"),
            F.round(
                F.when(
                    (F.col("_n") > 1) & (F.col("n_sources") > 0),
                    F.col("_sumh") / (F.col("n_sources") * (F.col("_n") - 1)),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("efficiency"),
        )
    )
