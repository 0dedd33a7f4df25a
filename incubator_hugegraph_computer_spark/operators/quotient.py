"""Quotient (host) graph aggregation.

The canonical 100 TB web-graph reduction: collapse the page graph onto
a coarser partition (page → host, file → repo, function → module) and
keep per-group-pair edge multiplicities. The reference has no
counterpart (SURVEY.md §2.10); at the target scale this is THE
operation that turns a 10^12-edge page graph into a graph that fits a
single workstation.

Plan shape: two hash joins edge→mapping (Catalyst broadcasts the
mapping when it is small; at web scale the mapping co-partitions with
the edges on the id key) followed by one map-side-combined
count aggregate — a single shuffle on (gsrc, gdst).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from incubator_hugegraph_computer_spark.graph import Graph


def quotient_graph(graph: Graph, mapping: DataFrame) -> DataFrame:
    """(gsrc, gdst, n_edges, n_src_vertices) — the multigraph quotient
    of the directed edge set under ``mapping (id, grp)``: one row per
    ordered group pair with at least one crossing edge (intra-group
    loops included), ``n_edges`` = crossing-edge multiplicity and
    ``n_src_vertices`` = distinct source vertices behind those edges.

    Vertices absent from ``mapping`` fall into group NULL and are
    dropped (inner joins) — pass a total mapping to keep everything.
    """
    m_src = mapping.select(F.col("id").alias("src"), F.col("grp").alias("gsrc"))
    m_dst = mapping.select(F.col("id").alias("dst"), F.col("grp").alias("gdst"))
    return (
        graph.edges.select("src", "dst")
        .join(m_src, "src")
        .join(m_dst, "dst")
        .groupBy("gsrc", "gdst")
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.countDistinct("src").alias("n_src_vertices"),
        )
    )


def host_rank(
    graph: Graph,
    mapping: DataFrame,
    max_iterations: int = 10,
    damping: float = 0.85,
    **engine_kwargs,
) -> DataFrame:
    """(grp, rank) — HostRank: PageRank over the quotient multigraph
    with crossing-edge multiplicities as weights (self-loops dropped).
    The standard two-stage web ranking (aggregate 10^12 pages to ~10^8
    hosts, rank hosts, propagate back): the expensive step is the ONE
    quotient shuffle; the rank iterations then run on a graph 4-6
    orders of magnitude smaller."""
    from incubator_hugegraph_computer_spark.operators.pagerank import pagerank_weighted

    q = quotient_graph(graph, mapping).where(F.col("gsrc") != F.col("gdst"))
    hedges = q.select(
        F.col("gsrc").alias("src"),
        F.col("gdst").alias("dst"),
        F.col("n_edges").cast("double").alias("weight"),
    )
    if hedges.isEmpty():
        # every edge intra-group (e.g. mod=1): PageRank's 1/n seed
        # would divide by zero on the empty vertex set
        return graph.spark.createDataFrame([], "grp long, rank double")
    hg = Graph.from_edges(hedges)
    pr = pagerank_weighted(
        hg, "weight", damping=damping, max_iterations=max_iterations, tol=0.0,
        **engine_kwargs,
    )
    return pr.select(F.col("id").alias("grp"), "rank")


def snapshot_diff(
    edges_old: DataFrame, edges_new: DataFrame, mapping: DataFrame
) -> DataFrame:
    """(gsrc, gdst, n_added, n_removed) — crawl-over-crawl edge delta
    aggregated to host-group pairs: per ordered group pair, how many
    distinct edges appear only in the new snapshot and how many only in
    the old. The per-batch report a continuously recrawled link graph
    publishes; both sides reduce to anti-joins co-partitioned on
    (src, dst) followed by one group-pair count — no full-graph state.
    """
    old = edges_old.select("src", "dst").distinct()
    new = edges_new.select("src", "dst").distinct()
    added = new.join(old, ["src", "dst"], "left_anti")
    removed = old.join(new, ["src", "dst"], "left_anti")
    m_src = mapping.select(F.col("id").alias("src"), F.col("grp").alias("gsrc"))
    m_dst = mapping.select(F.col("id").alias("dst"), F.col("grp").alias("gdst"))

    def _grp_counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.join(m_src, "src")
            .join(m_dst, "dst")
            .groupBy("gsrc", "gdst")
            .agg(F.count(F.lit(1)).alias(name))
        )

    return (
        _grp_counts(added, "n_added")
        .join(_grp_counts(removed, "n_removed"), ["gsrc", "gdst"], "full")
        .select(
            "gsrc",
            "gdst",
            F.coalesce("n_added", F.lit(0)).alias("n_added"),
            F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
        )
    )
