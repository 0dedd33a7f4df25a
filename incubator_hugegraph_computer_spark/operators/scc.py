"""Strongly connected components — trim + forward/backward coloring.

Reference: ``vermeer/algorithms/scc.go`` (248 LoC; coloring +
forward/backward phases driven by ``sccStepType``). Same contract here:
scc id = **min member id** (Vermeer colors by propagated ids and labels
the component with its root).

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

Each phase is the usual frontier join-aggregate loop. Outer iterations
= number of distinct SCC "layers" sharing colors — small after trim on
real graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from incubator_hugegraph_computer_spark.graph import Graph


def _propagate_min(vertices: DataFrame, edges: DataFrame, max_iter: int = 100) -> DataFrame:
    """(id, color): min source id reaching each vertex along edges."""
    state = vertices.select("id", F.col("id").alias("color"), F.lit(True).alias("chg")).persist()
    for _ in range(max_iter):
        msgs = (
            state.where("chg")
            .select(F.col("id").alias("src"), "color")
            .join(edges, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("color").alias("m"))
        )
        new = (
            state.join(msgs, "id", "left")
            .select(
                "id",
                F.least(F.col("color"), F.coalesce(F.col("m"), F.col("color"))).alias("color"),
                (F.coalesce(F.col("m"), F.col("color")) < F.col("color")).alias("chg"),
            )
            # eager checkpoint already stores the blocks — a persist on
            # top would materialize every round's state twice
            .localCheckpoint(eager=True)
        )
        state.unpersist()
        state = new
        if state.where("chg").isEmpty():
            break
    return state.select("id", "color")


def scc(graph: Graph, max_outer: int = 50) -> DataFrame:
    """(id, scc) with scc = min member id of the strongly connected
    component."""
    spark = graph.spark
    assigned_parts: list[DataFrame] = []
    verts = graph.vertices.select("id").persist()
    edges = graph.edges.select("src", "dst").where(F.col("src") != F.col("dst")).persist()

    for _ in range(max_outer):
        if verts.isEmpty():
            break
        # ---- trim loop: peel in/out-degree-0 vertices (own SCCs).
        # Every intermediate is localCheckpoint-truncated: trim rounds on
        # chain-shaped graphs can number in the hundreds and an
        # untruncated lineage OOMs the driver on plan strings alone.
        # Rounds are capped — trim is an optimization; anything left
        # untrimmed is handled correctly by the coloring phase.
        trim_rounds = 0
        while trim_rounds < 20:
            trim_rounds += 1
            srcs = edges.select("src").distinct()
            dsts = edges.select("dst").distinct()
            core = (
                verts.join(srcs.withColumnRenamed("src", "id"), "id", "left_semi")
                .join(dsts.withColumnRenamed("dst", "id"), "id", "left_semi")
                .localCheckpoint(eager=True)
            )
            trimmed = verts.join(core, "id", "left_anti")
            if trimmed.isEmpty():
                break
            assigned_parts.append(
                trimmed.select("id", F.col("id").alias("scc")).localCheckpoint(eager=True)
            )
            verts.unpersist()
            verts = core
            old_edges = edges
            edges = (
                edges.join(verts.withColumnRenamed("id", "src"), "src", "left_semi")
                .join(verts.withColumnRenamed("id", "dst"), "dst", "left_semi")
                .localCheckpoint(eager=True)
            )
            old_edges.unpersist()
        if verts.isEmpty():
            break

        # ---- color forward (min id), then sweep backward within color
        color = _propagate_min(verts, edges).persist()
        rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        # backward frontier from roots, constrained to same color
        colored_rev = (
            rev.join(color.withColumnRenamed("id", "src").withColumnRenamed("color", "c_src"), "src")
            .join(color.withColumnRenamed("id", "dst").withColumnRenamed("color", "c_dst"), "dst")
            .where(F.col("c_src") == F.col("c_dst"))
            .select("src", "dst")
            .persist()
        )
        frontier = color.where(F.col("color") == F.col("id")).select(
            "id", F.col("color").alias("scc")
        )
        members = frontier.localCheckpoint(eager=True)
        while True:
            nxt = (
                members.select(F.col("id").alias("src"), "scc")
                .join(colored_rev, "src")
                .select(F.col("dst").alias("id"), "scc")
                .distinct()
                .join(members.select("id"), "id", "left_anti")
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            members = members.unionAll(nxt).localCheckpoint(eager=True)
        assigned_parts.append(members)
        new_verts = verts.join(members.select("id"), "id", "left_anti").localCheckpoint(eager=True)
        verts.unpersist()
        verts = new_verts
        old_edges = edges
        edges = (
            edges.join(verts.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(verts.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
        old_edges.unpersist()
        color.unpersist()
        colored_rev.unpersist()
    else:
        # assigning fewer rows than graph.vertices with no error would
        # silently corrupt every downstream join
        if not verts.isEmpty():
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
