"""Per-vertex triangle counting — degree-oriented edge self-join.

Semantics replicated: triangles of the **undirected, deduplicated**
graph (self-loops removed), counted per vertex —
``computer-algorithm/.../community/trianglecount/TriangleCount.java:33-116``
and ``vermeer/algorithms/triangle_count.go:64-150`` agree on this;
the expected fixture counts {A:2, B:1, C:3, D:2, E:1} come from
``computer-test/.../TriangleCountTest.java:42-46``.

The reference's *mechanism* (broadcast each vertex's full neighbor set
to every neighbor, then set-intersect) is O(Σ deg²) message volume and
melts on power-law hubs, so it is deliberately NOT replicated. Instead:
the standard degree-oriented wedge join —

  1. orient each undirected edge from the endpoint with smaller
     (degree, id) to the larger  →  every wedge is enumerated at its
     lowest-degree corner, bounding work by O(Σ deg^{3/2}) (arboricity
     argument; cf. Suri & Vassilvitskii, "Counting Triangles and the
     Curse of the Last Reducer", WWW'11)
  2. wedges = oriented ⋈ oriented on the shared source
  3. triangle iff the closing pair is itself an oriented edge
     (semi-join), each triangle found exactly once
  4. per-vertex count = explode the three corners, groupBy(id).count

All joins are plain equi-joins on long keys; AQE handles residual skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from incubator_hugegraph_computer_spark.graph import Graph


def undirected_edges(edges: DataFrame) -> DataFrame:
    """Canonical undirected edge set: (a, b) with a < b, distinct,
    self-loops dropped (TriangleCount.java dedups via IdSet and skips
    self-loops at :64-67)."""
    return (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def triangles(edges: DataFrame) -> DataFrame:
    """(v1, v2, v3) — one row per triangle of the undirected graph,
    corners in (degree, id) orientation order."""
    und = undirected_edges(edges).persist()
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # Orient by (deg, id): src = smaller corner. Carry dst's rank so the
    # wedge join can order its two feet without another lookup.
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    ranked = und.join(da, "a").join(db, "b")
    fwd = F.struct(F.col("deg_a"), F.col("a")) < F.struct(F.col("deg_b"), F.col("b"))
    oriented = ranked.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(fwd, F.col("deg_b")).otherwise(F.col("deg_a")).alias("dst_deg"),
    ).persist()

    e1 = oriented.alias("e1")
    e2 = oriented.alias("e2")
    wedges = e1.join(e2, F.col("e1.src") == F.col("e2.src")).where(
        F.struct(F.col("e1.dst_deg"), F.col("e1.dst"))
        < F.struct(F.col("e2.dst_deg"), F.col("e2.dst"))
    )
    closing = oriented.select(
        F.col("src").alias("c_src"), F.col("dst").alias("c_dst")
    )
    tri = (
        wedges.join(
            closing,
            (F.col("e1.dst") == F.col("c_src")) & (F.col("e2.dst") == F.col("c_dst")),
            "left_semi",
        )
        .select(
            F.col("e1.src").alias("v1"),
            F.col("e1.dst").alias("v2"),
            F.col("e2.dst").alias("v3"),
        )
    )
    return tri


def triangle_count(graph: Graph) -> DataFrame:
    """(id, triangles) for every vertex (0 for triangle-free vertices)."""
    tri = triangles(graph.edges)
    corners = (
        tri.select(F.col("v1").alias("id"))
        .unionAll(tri.select(F.col("v2").alias("id")))
        .unionAll(tri.select(F.col("v3").alias("id")))
    )
    counts = corners.groupBy("id").agg(F.count(F.lit(1)).alias("triangles"))
    return (
        graph.vertices.select("id")
        .join(counts, "id", "left")
        .select("id", F.coalesce("triangles", F.lit(0)).alias("triangles"))
    )


def total_triangles(graph: Graph) -> int:
    return triangles(graph.edges).count()


def triangle_count_sampled(
    graph: Graph, threshold_hex: str = "29", seed: int = 42
) -> DataFrame:
    """DOULION estimator (Tsourakakis et al., KDD'09): keep each
    undirected edge with probability p via a DETERMINISTIC md5 coin
    (``md5(a:b:seed) < threshold_hex`` — lexicographic compare on the
    uniform hex digest, p = int(threshold_hex, 16) / 16^len), count
    triangles exactly on the sample, scale by 1/p³.

    One row: (sampled_edges, sampled_triangles, est_triangles). The
    coin replays bit-identically in SQL, so the estimate itself is
    oracle-gated — not just its expectation.

    Scale shape: the sample cuts the wedge-join input by p (and wedge
    WORK by ~p², triangles by p³) before the only expensive stage runs —
    this is the knob when even the degree-oriented exact count is too
    hot at 10^12 edges. Variance: Var[est] grows with 1/p³; DOULION's
    analysis keeps the relative error small while the sampled triangle
    count stays ≫ 1 — pick p so that st ≈ 10³⁺.
    """
    p = int(threshold_hex, 16) / float(16 ** len(threshold_hex))
    scale = (1.0 / p) ** 3
    und = undirected_edges(graph.edges)
    coin = F.md5(
        F.concat_ws(
            ":",
            F.col("a").cast("string"),
            F.col("b").cast("string"),
            F.lit(str(seed)),
        )
    )
    samp = und.where(coin < F.lit(threshold_hex)).persist()
    tri = triangles(samp.select(F.col("a").alias("src"), F.col("b").alias("dst")))
    st = tri.agg(F.count(F.lit(1)).alias("sampled_triangles"))
    se = samp.agg(F.count(F.lit(1)).alias("sampled_edges"))
    out = (
        se.crossJoin(st)  # one-row × one-row
        .select(
            "sampled_edges",
            "sampled_triangles",
            F.round(F.col("sampled_triangles") * F.lit(scale), 6).alias(
                "est_triangles"
            ),
        )
        # pin the one-row result, then release the sampled edge cache —
        # otherwise every call leaks a session-lifetime persist
        .localCheckpoint(eager=True)
    )
    samp.unpersist()
    return out
