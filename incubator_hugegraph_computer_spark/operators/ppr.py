"""Personalized PageRank — source-seeded teleport.

Reference: ``vermeer/algorithms/personalized_pagerank.go`` (154 LoC):
teleport mass and dangling mass return to the source vertex instead of
being spread uniformly:

    rank(v) = (1-d)·[v = src] + d·(Σ in_rank/outDeg + dangling·[v = src])

Same join-aggregate superstep as PageRank; only the update expression
differs.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, functions as F

from incubator_hugegraph_computer_spark.graph import Graph
from incubator_hugegraph_computer_spark.operators.pagerank import _PageRankBase
from incubator_hugegraph_computer_spark.plans.bsp import BspEngine, SuperstepContext


class PprProgram(_PageRankBase):
    name = "ppr"

    def __init__(self, source: int, damping: float = 0.85, tol: float = 0.0):
        self.source = source
        self.damping = damping
        self.tol = tol

    def initial_state(self, graph: Graph) -> DataFrame:
        return graph.out_degrees().select(
            "id",
            "out_deg",
            F.when(F.col("id") == self.source, 1.0).otherwise(0.0).alias("rank"),
            F.lit(0.0).alias("delta"),
        )

    def update(self, state: DataFrame, inbox: DataFrame, ctx: SuperstepContext) -> DataFrame:
        from incubator_hugegraph_computer_spark.operators.pagerank import _with_scalars

        is_src = (F.col("id") == self.source).cast("double")
        new_rank = (
            F.lit(1.0 - self.damping) * is_src
            + F.lit(self.damping)
            * (F.coalesce(F.col("msg"), F.lit(0.0)) + F.col("_dangling") * is_src)
        )
        return (
            _with_scalars(state, _dangling=ctx.prev_aggs["dangling"])
            .join(inbox, "id", "left")
            .select(
                "id",
                "out_deg",
                new_rank.alias("rank"),
                F.abs(new_rank - F.col("rank")).alias("delta"),
            )
        )

    def halt(self, ctx: SuperstepContext) -> bool:
        return self.tol > 0 and ctx.superstep > 1 and ctx.aggs["l1"] <= self.tol


def ppr(
    graph: Graph,
    source: int,
    damping: float = 0.85,
    max_iterations: int = 20,
    tol: float = 0.0,
    **engine_kwargs,
) -> DataFrame:
    """(id, rank) personalized to ``source``. tol=0 → exactly
    max_iterations supersteps (oracle-comparable fixed-iteration mode)."""
    resume = engine_kwargs.pop("resume", False)
    engine = BspEngine(graph, max_supersteps=max_iterations, **engine_kwargs)
    state, _ = engine.run(PprProgram(source, damping, tol), resume=resume)
    return state.select("id", "rank")
