"""Jaccard similarity of every vertex vs a source vertex.

Reference: ``vermeer/algorithms/jaccard.go`` (145 LoC, ``jaccard.source``):
similarity of neighbor sets J(u,v) = |N(u)∩N(v)| / |N(u)∪N(v)| over the
undirected (in+out) neighborhood.

One broadcast of the source's neighbor set + one groupBy — no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from incubator_hugegraph_computer_spark.graph import Graph


def jaccard(graph: Graph, source: int) -> DataFrame:
    """(id, jaccard) for every vertex with at least one neighbor in
    common semantics: vertices sharing no neighbor get 0.0; the source
    itself is excluded (vermeer emits 1.0 for self — excluded here and
    in the oracle for clarity)."""
    sym = graph.symmetrized().edges.persist()
    neigh = sym  # (src, dst) symmetric distinct
    src_neigh = neigh.where(F.col("src") == source).select(
        F.col("dst").alias("n")
    )
    deg = neigh.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    src_deg_row = deg.where(F.col("id") == source).collect()
    src_deg = src_deg_row[0]["deg"] if src_deg_row else 0
    inter = (
        neigh.join(F.broadcast(src_neigh), neigh.dst == src_neigh.n)
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        deg.join(inter, "id", "left")
        .where(F.col("id") != source)
        .select(
            "id",
            (
                F.coalesce(F.col("inter"), F.lit(0)).cast("double")
                / (F.col("deg") + F.lit(src_deg) - F.coalesce(F.col("inter"), F.lit(0)))
            ).alias("jaccard"),
        )
    )
