"""K4 (4-clique) counting via degeneracy-style edge orientation.

Extends the triangle kernel one level up the kClist ladder (Danisch et
al., WWW 2018): orient every undirected edge low-(degree,id) →
high-(degree,id), enumerate oriented triangles (u→v→w with u→w), then
extend each triangle by a fourth vertex x above w that closes all
three edges. Orientation bounds every join's fan-out by the graph
degeneracy, which is what keeps clique listing feasible on power-law
graphs where the naive 4-way join explodes on hubs.

Beyond-reference addition (SURVEY.md §2.10): the reference stops at
triangles; 4-cliques are the next standard cohesion census used for
spam-farm / link-ring detection on web graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from incubator_hugegraph_computer_spark.graph import Graph
from incubator_hugegraph_computer_spark.operators.triangle_count import undirected_edges


def k4_cliques(graph: Graph) -> DataFrame:
    """(v1, v2, v3, v4) — every 4-clique exactly once, corners in
    ascending id order. The enumeration runs in degeneracy orientation
    (fan-out bounded by core number, not hub degree); the final
    array_sort only relabels each row's 4 corners."""
    quads = _k4_quads(graph)
    s = F.array_sort(F.array("v1", "v2", "v3", "x"))
    return quads.select(
        s[0].alias("v1"), s[1].alias("v2"), s[2].alias("v3"), s[3].alias("v4")
    )


def _k4_quads(graph: Graph) -> DataFrame:
    """Oriented 4-clique rows (v1, v2, v3, x) — corner order follows the
    (degree, id) orientation, one row per clique."""
    und = undirected_edges(graph.edges)
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    ranked = und.join(da, "a").join(db, "b")
    fwd = F.struct(F.col("deg_a"), F.col("a")) < F.struct(F.col("deg_b"), F.col("b"))
    oriented = ranked.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(fwd, F.col("deg_a")).otherwise(F.col("deg_b")).alias("src_deg"),
        F.when(fwd, F.col("deg_b")).otherwise(F.col("deg_a")).alias("dst_deg"),
    ).persist()

    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    wedges = e1.join(e2, F.col("e1.src") == F.col("e2.src")).where(
        F.struct(F.col("e1.dst_deg"), F.col("e1.dst"))
        < F.struct(F.col("e2.dst_deg"), F.col("e2.dst"))
    )
    closing = oriented.select(F.col("src").alias("c_src"), F.col("dst").alias("c_dst"))
    tri = wedges.join(
        closing,
        (F.col("e1.dst") == F.col("c_src")) & (F.col("e2.dst") == F.col("c_dst")),
        "left_semi",
    ).select(
        F.col("e1.src").alias("v1"),
        F.col("e1.dst").alias("v2"),
        F.col("e2.dst").alias("v3"),
        F.col("e2.dst_deg").alias("v3_deg"),
    )

    # extend past the triangle's top vertex v3: x with (deg,id) above
    # v3 adjacent to all of v1, v2, v3 — each K4 enumerated exactly once
    ext = oriented.select(
        F.col("src").alias("v3"), F.col("dst").alias("x"), F.col("dst_deg").alias("x_deg")
    )
    cand = tri.join(ext, "v3")
    c12 = oriented.select(F.col("src").alias("v1"), F.col("dst").alias("x"))
    c22 = oriented.select(F.col("src").alias("v2"), F.col("dst").alias("x"))
    quads = (
        cand.join(c12, ["v1", "x"], "left_semi")
        .join(c22, ["v2", "x"], "left_semi")
        .select("v1", "v2", "v3", "x")
        .localCheckpoint(eager=True)
    )
    oriented.unpersist()
    return quads


def k4_count(graph: Graph) -> DataFrame:
    """(id, k4) — number of 4-cliques each vertex belongs to, for every
    vertex of the graph (0 for members of none)."""
    quads = _k4_quads(graph)
    corners = (
        quads.select(F.col("v1").alias("id"))
        .unionAll(quads.select(F.col("v2").alias("id")))
        .unionAll(quads.select(F.col("v3").alias("id")))
        .unionAll(quads.select(F.col("x").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("k4"))
    )
    return (
        graph.vertices.select("id")
        .join(corners, "id", "left")
        .select("id", F.coalesce("k4", F.lit(0)).alias("k4"))
        .localCheckpoint(eager=True)
    )
