"""SCAN structural graph clustering (Xu et al., SIGMOD 2007).

Clusters vertices by *structural similarity* instead of label
propagation: two adjacent vertices are eps-similar when

    sigma(u, v) = |N[u] ∩ N[v]| / sqrt(|N[u]| * |N[v]|) >= eps

over closed neighborhoods N[·]; a vertex is a **core** when its
eps-neighborhood (itself + eps-similar neighbors) has >= mu members.
Clusters are the connected components of core vertices under
eps-edges; non-core vertices eps-adjacent to a core join that core's
cluster (**border**, smallest cluster id when several qualify); the
remainder are **hubs** if their plain neighbors span >= 2 clusters,
else **outliers** — SCAN's signature ability to call out bridging
hubs and noise, which LPA/Louvain cannot.

Beyond-reference addition (SURVEY.md §2.10): the reference's
community family (LPA/SLPA/Louvain) has no structural-similarity
clusterer.

Scale shape: sigma comes from the degree-oriented triangle kernel
(common-neighbor counts per edge, wedge fan-out bounded by
low-degree→high-degree orientation), the component phase runs WCC on
the *core eps-subgraph only* (a small fraction of the graph at any
scale), and border/hub assignment is two join-aggregates. No Python
UDFs, no collected row sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from incubator_hugegraph_computer_spark.graph import Graph
from incubator_hugegraph_computer_spark.operators.structure import edge_embeddedness
from incubator_hugegraph_computer_spark.operators.triangle_count import undirected_edges
from incubator_hugegraph_computer_spark.operators.wcc import wcc

HUB = -1
OUTLIER = -2


def scan(graph: Graph, eps: float = 0.15, mu: int = 3) -> DataFrame:
    """(id, label) — label = cluster id (min core id in the cluster)
    for cluster members, -1 for hubs, -2 for outliers."""
    spark = graph.spark
    und = undirected_edges(graph.edges)
    sym = und.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("deg"))

    # closed-neighborhood cosine: |N[a] ∩ N[b]| = common + the two
    # endpoints (the edge guarantees a ∈ N[b] and b ∈ N[a])
    emb = edge_embeddedness(graph)
    sig = (
        emb.join(deg.withColumnRenamed("id", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("id", "b").withColumnRenamed("deg", "db"), "b")
        .select(
            "a",
            "b",
            (
                (F.col("embeddedness") + F.lit(2))
                / F.sqrt((F.col("da") + F.lit(1.0)) * (F.col("db") + F.lit(1.0)))
            ).alias("sigma"),
        )
    )
    eps_e = sig.where(F.col("sigma") >= F.lit(eps)).select("a", "b").persist()
    eps_sym = eps_e.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        eps_e.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    ecnt = eps_sym.groupBy(F.col("src").alias("id")).agg(
        (F.count(F.lit(1)) + F.lit(1)).alias("n")
    )
    cores = ecnt.where(F.col("n") >= F.lit(mu)).select("id").persist()

    if cores.isEmpty():
        clusters = spark.createDataFrame([], "id long, label long")
    else:
        core_e = (
            eps_e.join(cores.withColumnRenamed("id", "a"), "a", "left_semi")
            .join(cores.withColumnRenamed("id", "b"), "b", "left_semi")
            .select(F.col("a").alias("src"), F.col("b").alias("dst"))
        )
        clusters = wcc(
            Graph(cores, core_e, num_partitions=graph.num_partitions)
        ).select("id", F.col("comp").alias("label"))

    border = (
        eps_sym.join(clusters.withColumnRenamed("id", "src"), "src")
        .join(cores.withColumnRenamed("id", "dst"), "dst", "left_anti")
        .groupBy(F.col("dst").alias("id"))
        .agg(F.min("label").alias("label"))
    )
    members = clusters.unionAll(border).localCheckpoint(eager=True)

    rest_labels = (
        sym.join(members.withColumnRenamed("id", "dst"), "dst")
        .join(members.select(F.col("id").alias("src")), "src", "left_anti")
        .groupBy(F.col("src").alias("id"))
        .agg(F.countDistinct("label").alias("nc"))
    )
    rest = (
        graph.vertices.select("id")
        .join(members.select("id"), "id", "left_anti")
        .join(rest_labels, "id", "left")
        .select(
            "id",
            F.when(F.coalesce("nc", F.lit(0)) >= 2, F.lit(HUB))
            .otherwise(F.lit(OUTLIER))
            .cast("long")
            .alias("label"),
        )
    )
    out = members.unionAll(rest).localCheckpoint(eager=True)
    eps_e.unpersist()
    cores.unpersist()
    return out
