"""Eigenvector centrality — sum-normalized power iteration.

Completes the centrality family alongside the reference's PageRank /
closeness / betweenness / degree (``computer-algorithm/.../centrality/``)
and this repo's HITS / Katz: PageRank without teleport or out-degree
scaling, i.e. the principal eigenvector of the adjacency transpose:

    x_k(v) = Σ_{u→v} x_{k-1}(u);   x_k ← x_k / Σ_v x_k(v)

Each iteration is one engine superstep: the combined message pass
(SHUFFLE_HASH state⋈edges + map-side-combined groupBy(dst)), with the
normalization sum applied IN-PLAN via a broadcast one-row aggregate
(the PageRank scalar pattern) — one Spark action per iteration, V-row
state, nothing collected. Fixed iterations keep the result exactly
replayable by an unrolled SQL oracle; sum-normalization (not L2) keeps
the oracle in plain aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from incubator_hugegraph_computer_spark.graph import Graph
from incubator_hugegraph_computer_spark.plans.bsp import (
    BspEngine,
    BspProgram,
    SuperstepContext,
    message_pass,
)


class EigenvectorProgram(BspProgram):
    name = "eigenvector"

    def initial_state(self, graph: Graph) -> DataFrame:
        return graph.vertices.select("id", F.lit(1.0).alias("x"))

    def messages(self, state: DataFrame, graph: Graph, ctx: SuperstepContext) -> DataFrame:
        return message_pass(state, graph, msg_col=F.col("x"), frontier_filter=F.col("x") != 0.0)

    def combine(self, messages: DataFrame) -> DataFrame:
        return messages.groupBy(F.col("dst").alias("id")).agg(F.sum("msg").alias("msg"))

    def update(self, state: DataFrame, inbox: DataFrame, ctx: SuperstepContext) -> DataFrame:
        raw = state.join(inbox, "id", "left").select(
            "id", F.coalesce("msg", F.lit(0.0)).alias("r")
        )
        total = raw.agg(F.sum("r").alias("_t"))
        scale = F.when(F.col("_t") == 0.0, F.lit(1.0)).otherwise(F.col("_t"))
        return raw.crossJoin(F.broadcast(total)).select(
            "id", (F.col("r") / scale).alias("x")
        )


def eigenvector(graph: Graph, iterations: int = 5, **engine_kwargs) -> DataFrame:
    """(id, x) after ``iterations`` sum-normalized power steps."""
    engine_kwargs.setdefault("count_messages", False)
    engine = BspEngine(graph, max_supersteps=iterations, **engine_kwargs)
    state, _ = engine.run(EigenvectorProgram(), resume=False)
    return state.select("id", "x")
