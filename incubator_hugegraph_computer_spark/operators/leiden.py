"""Leiden-style community detection — Louvain with the connectivity
guarantee.

Traag, Waltman & van Eck, "From Louvain to Leiden: guaranteeing
well-connected communities" (Scientific Reports 2019) prove Louvain can
emit communities whose induced subgraph is DISCONNECTED (a community
held together only through vertices that later moved away). Leiden's
headline guarantee is that every returned community induces a connected
subgraph.

This operator delivers that guarantee as a refinement pass over the
engine's deterministic distributed Louvain (``operators/louvain.py``):
run Louvain, then split every community into the connected components
of its induced subgraph (one WCC over community-tagged edges), each
component canonicalized to its min member id. The full Leiden algorithm
interleaves refinement inside every aggregation level; the post-hoc
split delivers the same guarantee — and can only RAISE Newman
modularity (splitting a disconnected community loses no internal edges
and strictly shrinks the Σtot² penalty terms), so every modularity
invariant Louvain clears, this clears too.

Scale shape: Louvain's audited move/contract phases + ONE extra
community-equi-join to tag intra-community edges + one WCC (the
engine's min-propagation BSP, message-pass shuffle shape) over a
subgraph that is at most the input edge set.

Reference anchors: ``vermeer/algorithms/louvain.go`` (the reference's
Louvain surface; no Leiden in the reference — this is the standard
next rung), ``vermeer/algorithms/wcc.go`` (the component pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from incubator_hugegraph_computer_spark.graph import Graph
from incubator_hugegraph_computer_spark.operators.louvain import louvain
from incubator_hugegraph_computer_spark.operators.wcc import wcc


def refine_connected(graph: Graph, assignment: DataFrame, **engine_kwargs) -> DataFrame:
    """Split each community of ``assignment`` (id, community) into the
    connected components of its induced subgraph. Returns
    (id, community) with community = min member id of the connected
    part — vertices isolated inside their community become singletons."""
    sym = graph.symmetrized().edges
    a_src = assignment.select(F.col("id").alias("src"), F.col("community").alias("c_s"))
    a_dst = assignment.select(F.col("id").alias("dst"), F.col("community").alias("c_d"))
    induced = (
        sym.join(a_src, "src")
        .join(a_dst, "dst")
        .where(F.col("c_s") == F.col("c_d"))
        .select("src", "dst")
    )
    sub = Graph(assignment.select("id"), induced, graph.num_partitions)
    comp = wcc(sub, presymmetrized=True, **engine_kwargs)
    return comp.select("id", F.col("comp").alias("community"))


def leiden(
    graph: Graph,
    max_levels: int = 5,
    max_inner: int = 10,
    resolution: float = 1.0,
    weight_col: str | None = None,
    **engine_kwargs,
) -> DataFrame:
    """(id, community) — Louvain partition refined so that every
    community induces a connected subgraph (the Leiden guarantee).
    Community ids are min member ids, like ``louvain``."""
    asn = louvain(
        graph,
        max_levels=max_levels,
        max_inner=max_inner,
        resolution=resolution,
        weight_col=weight_col,
    )
    return refine_connected(graph, asn, **engine_kwargs)
