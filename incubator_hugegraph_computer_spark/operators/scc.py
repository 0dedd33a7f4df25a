"""Strongly connected components — trim + forward/backward coloring.

Reference: ``vermeer/algorithms/scc.go`` (248 LoC; coloring +
forward/backward phases driven by ``sccStepType``). Same contract here:
scc id = **min member id** (Vermeer colors by propagated ids and labels
the component with its root). The output is algorithm-independent —
any correct SCC decomposition labeled by min member id is identical —
so the Spark formulation is free to compress rounds.

Spark formulation (the standard distributed ColorSCC):

  0. **trim** — iteratively drop vertices with in-degree 0 or
     out-degree 0 among the remaining subgraph; each is its own SCC.
     Kills all DAG-ish mass (and bounds the outer loop on chain graphs).
  1. **color** — propagate min id forward (out-edges) to fixpoint:
     color[v] = min id that reaches v (including itself).
  2. **backward sweep** — from each root r (color[r] == r), walk
     reversed edges restricted to color class r; every vertex reached
     is in SCC(r) (it reaches r, and r reaches it by construction).
  3. remove assigned vertices, repeat.

Round compression (same trick as ``wcc.py`` WccStrideProgram): both
inner loops unroll ``stride`` propagation hops per materialization
barrier — the shuffle count per hop is unchanged, but driver
round-trips, convergence probes and lineage checkpoints drop by the
stride factor, which is what dominates on high-diameter color classes.
Every per-round state advances through ``plans/lineage.advance`` (lazy
localCheckpoint + persist + release-prev) — chained eager checkpoints
were measured to double per-round cost from ~round 16 and OOM the
driver near round 60 (PLANS.md "Lineage discipline").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from incubator_hugegraph_computer_spark.graph import Graph
from incubator_hugegraph_computer_spark.plans.lineage import (
    advance,
    advance_agg,
    advance_counted,
)


def _propagate_min(
    vertices: DataFrame, edges: DataFrame, max_iter: int = 100, stride: int = 4
) -> DataFrame:
    """(id, color): min source id reaching each vertex along edges.

    ``stride`` forward hops run per barrier; convergence is probed per
    barrier (at most ``stride - 1`` no-op hops after the true fixpoint,
    each a cheap empty-frontier join)."""
    state = advance(
        None,
        vertices.select("id", F.col("id").alias("color"), F.lit(True).alias("chg")),
    )
    for _ in range(0, max_iter, stride):
        cur = state
        for _hop in range(stride):
            # delta propagation: only vertices whose color changed in
            # the previous hop send — late hops touch a shrinking
            # frontier instead of re-joining every vertex to E
            msgs = (
                cur.where("chg")
                .select(F.col("id").alias("src"), "color")
                .join(edges, "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("color").alias("m"))
            )
            cur = cur.join(msgs, "id", "left").select(
                "id",
                F.least(
                    F.col("color"), F.coalesce(F.col("m"), F.col("color"))
                ).alias("color"),
                F.coalesce(F.col("m") < F.col("color"), F.lit(False)).alias("chg"),
            )
        # one action: materializes the new state AND probes convergence
        # (a barrier whose frontier produced no change is a fixpoint —
        # min propagation only triggers from prior changes)
        state, row = advance_agg(state, cur, F.sum(F.col("chg").cast("int")))
        if (row[0] or 0) == 0:
            break
    # hand back a materialized 2-col frame and release the internal
    # state — callers own (and must unpersist) the returned frame
    return advance(state, state.select("id", "color"))


def _backward_sweep(
    roots: DataFrame, colored_rev: DataFrame, stride: int = 4
) -> DataFrame:
    """All (id, scc) reached from ``roots`` along ``colored_rev``
    (reverse edges already restricted to equal color classes).
    ``stride`` frontier expansions per barrier."""
    seed = advance(None, roots)
    # members = lazy union over the advance()-materialized frontier
    # frames: each leaf is a flat cache scan, so the anti-join pays no
    # nested lineage and the member set is never re-materialized per
    # round (the same shape as betweenness's visited set)
    parts = [seed]
    members = seed
    frontier = seed
    while True:
        cur = frontier
        hops = []
        for _hop in range(stride):
            cur = (
                cur.select(F.col("id").alias("src"), "scc")
                .join(colored_rev, "src")
                .select(F.col("dst").alias("id"), "scc")
                .distinct()
            )
            hops.append(cur)
        grown = hops[0]
        for h in hops[1:]:
            grown = grown.unionAll(h)
        nxt, n = advance_counted(
            None,
            grown.distinct().join(members.select("id"), "id", "left_anti"),
        )
        if n == 0:
            nxt.unpersist()
            break
        parts.append(nxt)
        members = members.unionAll(nxt)
        frontier = nxt
    return members


def scc(graph: Graph, max_outer: int = 50, stride: int = 4) -> DataFrame:
    """(id, scc) with scc = min member id of the strongly connected
    component."""
    spark = graph.spark
    assigned_parts: list[DataFrame] = []
    verts, n_verts = advance_counted(None, graph.vertices.select("id"))
    edges = advance(
        None, graph.edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    )

    for _ in range(max_outer):
        if n_verts == 0:
            break
        # ---- trim loop: peel in/out-degree-0 vertices (own SCCs).
        # Rounds are capped — trim is an optimization; anything left
        # untrimmed is handled correctly by the coloring phase.
        trim_rounds = 0
        while trim_rounds < 20:
            trim_rounds += 1
            srcs = edges.select("src").distinct()
            dsts = edges.select("dst").distinct()
            core, n_core = advance_counted(
                None,
                verts.join(srcs.withColumnRenamed("src", "id"), "id", "left_semi")
                .join(dsts.withColumnRenamed("dst", "id"), "id", "left_semi"),
            )
            if n_core == n_verts:  # stable — no extra anti-join job
                core.unpersist()
                break
            assigned_parts.append(
                advance(
                    None,
                    verts.join(core, "id", "left_anti").select(
                        "id", F.col("id").alias("scc")
                    ),
                )
            )
            verts.unpersist()
            verts, n_verts = core, n_core
            edges = advance(
                edges,
                edges.join(verts.withColumnRenamed("id", "src"), "src", "left_semi")
                .join(verts.withColumnRenamed("id", "dst"), "dst", "left_semi"),
            )
        if n_verts == 0:
            break

        # The trimmed core is usually orders of magnitude smaller than
        # the input (DAG mass is gone) while the cached edge frame still
        # carries full-width partitioning — every propagate barrier then
        # pays full task scheduling on a tiny graph. Re-bucket the core
        # by src once per outer round; src is the propagate/sweep join
        # key, so the cached layout feeds every hop without reshuffling
        # the edge side.
        parts = min(graph.num_partitions, max(4, n_verts // 25_000 + 1))
        if parts < graph.num_partitions:
            edges = advance(edges, edges.repartition(parts, "src"))

        # ---- color forward (min id), then sweep backward within color
        color = _propagate_min(verts, edges, stride=stride)
        rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        # backward frontier from roots, constrained to same color
        colored_rev = advance(
            None,
            rev.join(
                color.withColumnRenamed("id", "src").withColumnRenamed(
                    "color", "c_src"
                ),
                "src",
            )
            .join(
                color.withColumnRenamed("id", "dst").withColumnRenamed(
                    "color", "c_dst"
                ),
                "dst",
            )
            .where(F.col("c_src") == F.col("c_dst"))
            .select("src", "dst")
            .repartition(parts, "src"),
        )
        roots = color.where(F.col("color") == F.col("id")).select(
            "id", F.col("color").alias("scc")
        )
        members = _backward_sweep(roots, colored_rev, stride=stride)
        color.unpersist()
        assigned_parts.append(members)
        verts, n_verts = advance_counted(
            verts, verts.join(members.select("id"), "id", "left_anti")
        )
        edges = advance(
            edges,
            edges.join(verts.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(verts.withColumnRenamed("id", "dst"), "dst", "left_semi"),
        )
        colored_rev.unpersist()
    else:
        # assigning fewer rows than graph.vertices with no error would
        # silently corrupt every downstream join
        if n_verts != 0:
            raise RuntimeError(
                f"scc did not assign every vertex within max_outer={max_outer} "
                "outer iterations (pathological SCC-chain input) — raise max_outer"
            )
    verts.unpersist()
    edges.unpersist()

    out = assigned_parts[0] if assigned_parts else spark.createDataFrame([], "id long, scc long")
    for p in assigned_parts[1:]:
        out = out.unionAll(p)
    return out
