"""Bipartite graph projection (co-occurrence edges).

A link-graph pipeline constantly derives one-mode graphs from two-mode
ones — co-purchase (parts sharing an order), co-authorship, hosts
sharing an IP. The reference builds its edge tables upstream of the
engine (``computer-api/.../input``); this operator makes the derivation
itself a first-class distributed step so the projected graph feeds the
BSP algorithms directly.

``project(pairs, group_col, item_col)``: for every unordered item pair
{a,b} co-occurring under at least one group, emit
(src=a, dst=b, weight=#groups containing both), src < dst.

Physical shape: one self-join of the distinct (group, item) table on
the group key (hash-shuffled, co-partitioned — both sides are the same
DataFrame so AQE reuses the exchange), then a map-side-combined count
per pair. The join fan-out is Σ_g d(g)² — the classic wedge blowup —
so ``max_group_size`` caps hyper-groups the same way link_prediction
caps hub intermediaries (a group shared by everyone carries no pairwise
signal and quadratic cost; the cap is declared semantics, replayed by
the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from incubator_hugegraph_computer_spark.graph import Graph


def project(
    pairs: DataFrame,
    group_col: str,
    item_col: str,
    max_group_size: int | None = None,
) -> DataFrame:
    """(src, dst, weight): co-occurrence projection of a bipartite
    (group, item) table onto the item side."""
    gi = pairs.select(
        F.col(group_col).alias("g"), F.col(item_col).alias("item")
    ).distinct()
    if max_group_size is not None:
        sizes = gi.groupBy("g").agg(F.count(F.lit(1)).alias("_n"))
        gi = gi.join(
            sizes.where(F.col("_n") <= max_group_size).select("g"), "g"
        )
    a = gi.select("g", F.col("item").alias("src"))
    b = gi.select("g", F.col("item").alias("dst"))
    return (
        a.join(b, "g")
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def butterfly_count(graph: Graph, max_hub: int = 256) -> DataFrame:
    """One row (wedge_pairs, butterflies): the bipartite 4-cycle census
    of the directed edge incidence (src side ⋈ shared dsts).

    A butterfly = two sources both linking to the same two targets —
    the bipartite analogue of the triangle, the density signal for
    co-citation spam blocks and copy-farms. butterflies =
    Σ_{src pairs} C(co_degree, 2) over the dst-grouped projection;
    ``max_hub`` caps the shared target's in-degree exactly like the
    bibliographic-coupling projection (a target cited by everyone
    contributes no pairwise signal and quadratic cost — declared
    semantics, replayed by the oracle; non-binding at gate SFs).

    Scale: inherits ``project``'s co-degree bound — the per-target
    pair fan-out is ≤ C(max_hub, 2); counts are exact longs.
    """
    pairs = project(
        graph.edges.select("src", "dst"),
        group_col="dst",
        item_col="src",
        max_group_size=max_hub,
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("long").alias("wedge_pairs"),
        F.coalesce(
            F.sum((F.col("weight") * (F.col("weight") - 1) / F.lit(2)).cast("long")),
            F.lit(0),
        )
        .cast("long")
        .alias("butterflies"),
    )
