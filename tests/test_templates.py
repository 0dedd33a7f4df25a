"""ReduceProgram / FilterProgram template tests — max-label propagation
(the mirror image of WCC's min) built on the ReduceComputation surface,
and a filtered variant that refuses labels above a cap."""

from pyspark.sql import functions as F

from incubator_hugegraph_computer_spark.plans.bsp import (
    BspEngine,
    FilterProgram,
    ReduceProgram,
)
from tests.conftest import make_graph


class MaxLabel(ReduceProgram):
    """Every vertex converges to the max id reachable over undirected
    paths — ReduceComputation with a ValueMaxCombiner."""

    name = "max_label"

    def initial_state(self, graph):
        return graph.vertices.select(
            "id", F.col("id").alias("label"), F.lit(True).alias("active")
        )

    def message_col(self, ctx):
        return F.col("label")

    def reduce_agg(self, col):
        return F.max(col)

    def merge(self, state, inbox, ctx):
        new_label = F.greatest(F.col("label"), F.coalesce(F.col("msg"), F.col("label")))
        return state.join(inbox, "id", "left").select(
            "id", new_label.alias("label"), (new_label > F.col("label")).alias("active")
        )


class CappedMaxLabel(FilterProgram, MaxLabel):
    """FilterComputation semantics: messages carrying labels above the
    cap are dropped at the combiner (per-message predicate); the rest of
    the program is MaxLabel's."""

    name = "capped_max_label"
    cap = 3

    def keep(self, msg):
        return msg <= self.cap


def _components_graph(spark):
    # component {0,1,2} and component {3,4,5}
    return make_graph(
        spark,
        [(0, 1), (1, 2), (1, 0), (2, 1), (4, 3), (4, 5), (3, 4), (5, 4)],
        vertex_ids=range(6),
    )


def test_reduce_program_max_propagation(spark):
    g = _components_graph(spark)
    state, ctx = BspEngine(g, max_supersteps=10).run(MaxLabel())
    got = {r["id"]: r["label"] for r in state.collect()}
    assert got == {0: 2, 1: 2, 2: 2, 3: 5, 4: 5, 5: 5}
    assert ctx.active_vertices == 0  # converged before the budget


def test_filter_program_drops_messages(spark):
    g = _components_graph(spark)
    state, _ = BspEngine(g, max_supersteps=10).run(CappedMaxLabel())
    got = {r["id"]: r["label"] for r in state.collect()}
    # labels 4 and 5 are filtered in flight: vertex 3 only ever hears
    # ≤3; 4 and 5 keep their own (self) labels
    assert got[0] == 2 and got[1] == 2 and got[2] == 2
    assert got[3] == 3 and got[4] == 4 and got[5] == 5
