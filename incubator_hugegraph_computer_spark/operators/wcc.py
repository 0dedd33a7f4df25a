"""Weakly connected components — min-id label propagation.

Reference semantics: ``computer-algorithm/.../community/wcc/Wcc.java:32-71``
(adopt the combined min message when smaller, rebroadcast, vote-to-halt)
with Vermeer's explicit symmetrization (min over in AND out neighbors,
``vermeer/algorithms/wcc.go:56-129``) — true weak connectivity without
assuming pre-symmetrized input. Component id = min member id; ids here
are dense non-negative longs so numeric ``min`` reproduces the
reference's BytesId ordering (varint length-first == numeric order for
non-negative longs — ``BytesUtil.compare``, SURVEY §1.3).

Scale shape: the frontier (vertices whose component shrank last step)
is the only message source — ``where(active)`` before the join is the
reference's inactive-vertex skip (``FileGraphPartition.java:213-222``)
and is what makes late supersteps cheap on high-diameter graphs.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, functions as F

from incubator_hugegraph_computer_spark.graph import Graph
from incubator_hugegraph_computer_spark.plans.bsp import (
    BspEngine,
    BspProgram,
    SuperstepContext,
    message_pass,
)


class WccProgram(BspProgram):
    name = "wcc"

    def initial_state(self, graph: Graph) -> DataFrame:
        return graph.vertices.select(
            "id", F.col("id").alias("comp"), F.lit(True).alias("active")
        )

    def messages(self, state: DataFrame, graph: Graph, ctx: SuperstepContext) -> DataFrame:
        return message_pass(
            state, graph, msg_col=F.col("comp"), frontier_filter=F.col("active")
        )

    def combine(self, messages: DataFrame) -> DataFrame:
        # ValueMinCombiner (computer-api/.../combiner/ValueMinCombiner.java);
        # map-side partial min == sender-side combining.
        return messages.groupBy(F.col("dst").alias("id")).agg(F.min("msg").alias("msg"))

    def update(self, state: DataFrame, inbox: DataFrame, ctx: SuperstepContext) -> DataFrame:
        new_comp = F.least(F.col("comp"), F.coalesce(F.col("msg"), F.col("comp")))
        return state.join(inbox, "id", "left").select(
            "id",
            new_comp.alias("comp"),
            (new_comp < F.col("comp")).alias("active"),
        )

def wcc(
    graph: Graph,
    max_supersteps: int = 100,
    presymmetrized: bool = False,
    **engine_kwargs,
) -> DataFrame:
    """(id, comp) over the symmetrized graph; comp = min id in component.

    max_supersteps bounds at graph diameter; the engine's built-in
    no-messages-and-no-active termination fires at convergence.
    ``presymmetrized=True`` skips the one-time symmetrization shuffle —
    pass it when the caller's edge table is already the undirected
    distinct set (e.g. built once at ingest and reused across
    algorithms, optionally CSR-packed)."""
    resume = engine_kwargs.pop("resume", False)
    g = graph if presymmetrized else graph.symmetrized().cache()
    engine = BspEngine(g, max_supersteps=max_supersteps, **engine_kwargs)
    state, _ = engine.run(WccProgram(), resume=resume)
    result = state.select("id", "comp")
    return result
