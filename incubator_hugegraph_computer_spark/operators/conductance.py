"""Community quality metrics: conductance / volume / cut per label.

Beyond-reference addition (SURVEY.md §2.10): the reference computes a
global modularity statistic (``vermeer/algorithms/modularity.go``) but
no per-community cut metrics. Conductance φ(S) = cut(S) / min(vol(S),
vol(V)−vol(S)) over the symmetrized graph is the standard sanity check
on any community assignment (LPA / Louvain / SLPA output plugs in
directly).

Spark shape: two hash joins label the endpoints of each symmetrized
edge, one groupBy(label) aggregates volume and cut map-side, and the
graph's total volume enters as a broadcast one-row join — no collect,
no window, scale-safe (E-row shuffle on the edge side, V-row on the
label side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from incubator_hugegraph_computer_spark.graph import Graph


def conductance(graph: Graph, labels: DataFrame) -> DataFrame:
    """Per-label ``(label, size, volume, cut, conductance)``.

    ``labels``: (id, label). Volumes count symmetrized directed edges
    (each undirected edge contributes 1 to both endpoints' communities'
    volume), so vol(V) = 2·|undirected edges|. Labels whose vertices
    have no edges get volume 0 and conductance 0.0.
    """
    sym = graph.symmetrized().edges.select("src", "dst")
    lab = labels.select(F.col("id"), F.col("label"))
    tagged = (
        sym.join(lab.withColumnRenamed("id", "src").withColumnRenamed("label", "_sl"), "src")
        .join(lab.withColumnRenamed("id", "dst").withColumnRenamed("label", "_dl"), "dst")
    )
    per_label = tagged.groupBy(F.col("_sl").alias("label")).agg(
        F.count(F.lit(1)).alias("volume"),
        F.sum((F.col("_sl") != F.col("_dl")).cast("long")).alias("cut"),
    )
    sizes = lab.groupBy("label").agg(F.count(F.lit(1)).alias("size"))
    # scalar-in-plan: one-row broadcast BNLJ (the build side is a global
    # aggregate — exactly one row, the audit tool recognizes this shape)
    total = sym.agg(F.count(F.lit(1)).alias("_vol_total"))
    return (
        sizes.join(per_label, "label", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "label",
            "size",
            F.coalesce("volume", F.lit(0)).alias("volume"),
            F.coalesce("cut", F.lit(0)).alias("cut"),
            F.when(
                F.least(F.col("volume"), F.col("_vol_total") - F.col("volume")) > 0,
                F.col("cut")
                / F.least(F.col("volume"), F.col("_vol_total") - F.col("volume")),
            )
            .otherwise(0.0)
            .alias("conductance"),
        )
    )
