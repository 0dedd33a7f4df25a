"""VoteRank — influence-maximization seed selection.

Zhang, Lü et al., "Identifying a set of influential spreaders in
complex networks" (Scientific Reports 2016). Every vertex starts with
voting ability 1; in each of K rounds the vertex with the highest
neighbor-vote total is elected, its own ability drops to 0 (it stops
voting), and each of its neighbors loses δ = 1/⟨k⟩ ability (floored at
0), suppressing seeds that would cover the same neighborhood. The
result is a diverse top-K spreader set — the standard seed-selection
primitive for crawl prioritization / information-spread studies on
link graphs, complementing the global rankings (pagerank, opic,
hostrank) that pick redundant adjacent hubs.

Not in the reference suite; the natural companion to
``operators/crawl.py``'s priority feeds (the job CLI accepts any
(id, value) frame as a crawl priority).

Determinism / oracle parity: scores are rounded to 6 dp before the
argmax (declared semantics — removes float summation-order ambiguity
from the election), ties break to the lowest id, and δ is one double
division of two exact counts, identical in both engines. Abilities are
updated by per-vertex sequential subtraction (same order both sides).

Scale shape per round: one join-aggregate over the sym edge table
(message_pass's shuffle shape) for the vote totals, a
TakeOrderedAndProject(1) election, and a broadcast semi-join of the
winner's neighbor set for the ability update — the winner's neighbor
list is one vertex's adjacency. K driver round-trips total (seed
selection is inherently sequential in K); state localCheckpoints per
round so lineage stays flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from incubator_hugegraph_computer_spark.graph import Graph


def voterank(graph: Graph, k: int = 10) -> DataFrame:
    """(sel_rank, id, score) — the K elected spreaders in election
    order with their (rounded) winning vote totals."""
    sym = graph.symmetrized().edges.localCheckpoint(eager=True)
    n_vertices = graph.vertices.count()
    n_sym = sym.count()
    if n_sym == 0:
        return graph.vertices.sparkSession.createDataFrame(
            [], "sel_rank int, id long, score double"
        )
    delta = float(n_vertices) / float(n_sym)  # 1 / average degree

    ab = graph.vertices.select(
        "id", F.lit(1.0).alias("a"), F.lit(False).alias("el")
    ).localCheckpoint(eager=True)

    picks: list[tuple[int, int, float]] = []
    for rnd in range(1, k + 1):
        votes = (
            sym.join(ab.select(F.col("id").alias("dst"), "a"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("a").alias("s"))
        )
        cand = (
            ab.where(~F.col("el"))
            .join(votes, "id", "left")
            .select("id", F.round(F.coalesce("s", F.lit(0.0)), 6).alias("sc"))
        )
        top = cand.orderBy(F.desc("sc"), F.asc("id")).limit(1).collect()
        if not top:
            break
        win_id, win_sc = top[0]["id"], top[0]["sc"]
        picks.append((rnd, win_id, win_sc))
        neigh = sym.where(F.col("src") == win_id).select(F.col("dst").alias("id"))
        ab = (
            ab.join(F.broadcast(neigh.withColumn("_n", F.lit(1))), "id", "left")
            .select(
                "id",
                F.when(F.col("id") == win_id, F.lit(0.0))
                .when(F.col("_n").isNotNull(), F.greatest(F.lit(0.0), F.col("a") - delta))
                .otherwise(F.col("a"))
                .alias("a"),
                (F.col("el") | (F.col("id") == win_id)).alias("el"),
            )
            .localCheckpoint(eager=True)
        )
    return graph.vertices.sparkSession.createDataFrame(
        picks, "sel_rank int, id long, score double"
    )
