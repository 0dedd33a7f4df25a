"""SLPA — speaker-listener label propagation (overlapping communities).

Reference: ``vermeer/algorithms/slpa.go`` (251 LoC, Go): every vertex
keeps a label *memory*; each round every neighbor speaks one label
drawn from its memory with probability proportional to frequency, the
listener adopts the most frequent label heard and appends it to its own
memory; after T rounds a vertex belongs to every community whose label
holds ≥ ``r`` of its memory.

Spark formulation (deterministic): the speaker's weighted draw uses a
seeded xxhash64 uniform per (edge, round) instead of ``rand()`` —
reproducible across runs and partitionings. Memory is a map column
folded per round; the speak step explodes memory (≤ round+1 entries)
against the symmetrized edge list, so per-round work is
O(E · round) rows through one window — bounded by T·E total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from incubator_hugegraph_computer_spark.graph import Graph


def slpa(
    graph: Graph,
    rounds: int = 5,
    threshold: float = 0.3,
    seed: int = 42,
) -> DataFrame:
    """(id, label) — one row per (vertex, retained community label);
    vertices can appear in multiple communities (the overlap)."""
    sym = graph.symmetrized().edges.persist()
    # memory as (id, label, cnt) long rows — simpler to fold than a map
    mem = graph.vertices.select(
        "id", F.col("id").alias("label"), F.lit(1).alias("cnt")
    ).localCheckpoint(eager=True)

    for rnd in range(1, rounds + 1):
        speaker = mem.withColumnRenamed("id", "src")
        cand = sym.join(speaker.hint("shuffle_hash"), "src")
        # weighted draw: u = hash(seed, rnd, src, dst) in [0,1);
        # pick the first label (ordered) whose cumulative count exceeds
        # u * total — exact inverse-CDF sampling, fully deterministic.
        w_edge = Window.partitionBy("src", "dst").orderBy("label")
        drawn = (
            cand.withColumn("cum", F.sum("cnt").over(w_edge))
            .withColumn("tot", F.sum("cnt").over(Window.partitionBy("src", "dst")))
            .withColumn(
                "u",
                (F.abs(F.xxhash64(F.lit(seed), F.lit(rnd), "src", "dst")) % 1_000_000)
                / 1_000_000.0,
            )
            .where(F.col("cum") - F.col("cnt") <= F.col("u") * F.col("tot"))
            .where(F.col("cum") > F.col("u") * F.col("tot"))
            .select(F.col("dst").alias("id"), "label")
        )
        # listener: most frequent heard label, min-label tie-break
        heard = drawn.groupBy("id", "label").agg(F.count(F.lit(1)).alias("c"))
        w_id = Window.partitionBy("id").orderBy(F.desc("c"), F.asc("label"))
        adopted = (
            heard.withColumn("rn", F.row_number().over(w_id))
            .where(F.col("rn") == 1)
            .select("id", "label", F.lit(1).alias("cnt"))
        )
        mem = (
            mem.unionAll(adopted)
            .groupBy("id", "label")
            .agg(F.sum("cnt").alias("cnt"))
            .localCheckpoint(eager=True)
        )

    tot = Window.partitionBy("id")
    return (
        mem.withColumn("tot", F.sum("cnt").over(tot))
        .where(F.col("cnt") >= F.col("tot") * F.lit(threshold))
        .select("id", "label")
    )
