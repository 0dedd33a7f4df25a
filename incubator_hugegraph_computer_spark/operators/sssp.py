"""Single-source shortest path — BSP frontier relaxation.

Reference: ``computer-algorithm/.../path/shortest/
SingleSourceShortestPath.java:40-285`` (Dijkstra-by-BSP: messages carry
total weight, vertex adopts shorter distance and forwards
weight + edge_weight; missing weight property defaults to 1) and the
plain-distance Vermeer variant (``vermeer/algorithms/sssp.go:46-125``,
``sssp.source`` param).

Spark shape: the frontier is the set of vertices whose distance
improved last superstep; each superstep is frontier⋈edges →
groupBy(dst).min — the canonical shrinking-frontier pass. Supersteps ≈
(weighted) diameter.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, functions as F

from incubator_hugegraph_computer_spark.graph import Graph
from incubator_hugegraph_computer_spark.plans.bsp import (
    BspEngine,
    BspProgram,
    SuperstepContext,
)


class SsspProgram(BspProgram):
    name = "sssp"

    def __init__(self, source: int, weight_col: str | None = None):
        self.source = source
        self.weight_col = weight_col

    def initial_state(self, graph: Graph) -> DataFrame:
        return graph.vertices.select(
            "id",
            F.when(F.col("id") == self.source, F.lit(0.0)).alias("dist"),  # else null = ∞
            (F.col("id") == self.source).alias("active"),
        )

    def messages(self, state: DataFrame, graph: Graph, ctx: SuperstepContext) -> DataFrame:
        if self.weight_col is None:
            from incubator_hugegraph_computer_spark.plans.bsp import message_pass

            return message_pass(
                state, graph, msg_col=F.col("dist") + 1.0, frontier_filter=F.col("active")
            )
        # weighted: the message needs the per-edge weight column, so the
        # pass must stream edges (no CSR); hash-join hinted, state builds.
        w = F.coalesce(F.col(self.weight_col).cast("double"), F.lit(1.0))
        return (
            state.where(F.col("active"))
            .select(F.col("id").alias("src"), "dist")
            .hint("shuffle_hash")
            .join(graph.edges, "src")
            .select("dst", (F.col("dist") + w).alias("msg"))
        )

    def combine(self, messages: DataFrame) -> DataFrame:
        return messages.groupBy(F.col("dst").alias("id")).agg(F.min("msg").alias("msg"))

    def update(self, state: DataFrame, inbox: DataFrame, ctx: SuperstepContext) -> DataFrame:
        improved = F.col("msg").isNotNull() & (
            F.col("dist").isNull() | (F.col("msg") < F.col("dist"))
        )
        return state.join(inbox, "id", "left").select(
            "id",
            F.when(improved, F.col("msg")).otherwise(F.col("dist")).alias("dist"),
            improved.alias("active"),
        )

    def agg_exprs(self, ctx: SuperstepContext) -> dict[str, Any]:
        return {"reached": F.sum(F.col("dist").isNotNull().cast("long"))}


def sssp(
    graph: Graph,
    source: int,
    weight_col: str | None = None,
    max_supersteps: int = 100,
    **engine_kwargs,
) -> DataFrame:
    """(id, dist) for vertices reachable from ``source`` (unreachable
    vertices are omitted, matching the reference's '∞ not emitted')."""
    resume = engine_kwargs.pop("resume", False)
    engine = BspEngine(graph, max_supersteps=max_supersteps, **engine_kwargs)
    state, _ = engine.run(SsspProgram(source, weight_col), resume=resume)
    return state.where(F.col("dist").isNotNull()).select("id", "dist")
