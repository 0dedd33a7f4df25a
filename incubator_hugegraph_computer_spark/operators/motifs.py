"""Dyad census and directed-triangle motif census.

Not in the reference suite, but the standard structural summary of a
directed link graph alongside reciprocity / assortativity (both in
``operators/link_prediction.py``) and the reference's TriangleCount
(``computer-algorithm/.../community/triangle/TriangleCount.java`` counts
*undirected* triangles only — the directed motif split below is the
information it discards).

Definitions (over the distinct directed edge set, self-loops excluded):

- **mutual dyads**: unordered pairs {u,v} with BOTH u→v and v→u.
- **asymmetric dyads**: unordered pairs with exactly one direction.
- **null dyads**: the remaining V·(V-1)/2 pairs — derived arithmetically
  (never materialized; the pair space is O(V²)).
- **cyclic triangles**: vertex sets {a,b,c} carrying a directed 3-cycle
  a→b→c→a. Each cycle is counted once by anchoring at its minimum
  vertex; a set supporting cycles in both rotational directions counts
  2 (they are distinct edge sets).
- **transitive triangles**: ordered triples (a,b,c) of distinct vertices
  with a→b, b→c and a→c — counted per embedding, the standard
  feed-forward-loop count.

Physical shape: everything is two/three-way self-joins of the distinct
edge list — hash-shuffled on the join keys, no broadcast of E, map-side
combined counts, one row out. The wedge joins (e ⋈ e on the shared
middle vertex) are the same shuffle shape as TriangleCount's
degree-oriented join and inherit its scale story: hub middles dominate
wedge counts, and AQE skew-join splitting handles them (the canonical
hub cap used by link_prediction is deliberately NOT applied here — a
census must be exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from incubator_hugegraph_computer_spark.graph import Graph


def motif_census(graph: Graph) -> DataFrame:
    """One row: (n_vertices, mutual_dyads, asym_dyads, null_dyads,
    cyclic_triangles, transitive_triangles)."""
    e = graph.edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))

    # Dyads: count connected unordered pairs once via canonicalization.
    pairs = (
        e.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_dir"))
    )
    dyads = pairs.agg(
        F.sum(F.when(F.col("n_dir") == 2, 1).otherwise(0)).alias("mutual_dyads"),
        F.sum(F.when(F.col("n_dir") == 1, 1).otherwise(0)).alias("asym_dyads"),
    )

    n_v = graph.vertices.agg(F.count(F.lit(1)).alias("n_vertices"))

    # Cyclic triangles: wedge a→b→c joined back to the closing edge
    # c→a, anchored at the rotation minimum so each directed 3-cycle
    # counts exactly once.
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = e.select(F.col("src").alias("c"), F.col("dst").alias("a"))
    cyc = (
        e1.join(e2, "b")
        .where((F.col("a") < F.col("b")) & (F.col("a") < F.col("c")))
        .join(e3, ["c", "a"])
        .agg(F.count(F.lit(1)).alias("cyclic_triangles"))
    )

    # Transitive triangles (feed-forward loops): a→b, b→c, a→c with the
    # three vertices distinct (a≠b, b≠c by edge construction; a≠c by
    # the wedge filter — a→c being an edge already implies a≠c, but the
    # wedge itself must exclude a=c before the closing join).
    ec = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    trans = (
        e1.join(e2, "b")
        .where(F.col("a") != F.col("c"))
        .join(ec, ["a", "c"])
        .agg(F.count(F.lit(1)).alias("transitive_triangles"))
    )

    out = n_v.crossJoin(dyads).crossJoin(cyc).crossJoin(trans)
    return out.select(
        "n_vertices",
        F.coalesce("mutual_dyads", F.lit(0)).alias("mutual_dyads"),
        F.coalesce("asym_dyads", F.lit(0)).alias("asym_dyads"),
        (
            F.col("n_vertices") * (F.col("n_vertices") - 1) / F.lit(2)
            - F.coalesce("mutual_dyads", F.lit(0))
            - F.coalesce("asym_dyads", F.lit(0))
        ).cast("long").alias("null_dyads"),
        "cyclic_triangles",
        "transitive_triangles",
    )


def triad_census(graph: Graph) -> DataFrame:
    """Undirected triad census in closed form — one row
    (n_vertices, n_edges, triads_empty, triads_one_edge, triads_path,
    triads_triangle).

    Enumerating the O(V³) triple space is impossible at any scale; the
    census follows from three O(E) aggregates by inclusion-exclusion
    (Batagelj-Mrvar's subtraction scheme restricted to the undirected
    4 classes):

        W  = Σ_v C(deg_v, 2)            (wedges, closed or open)
        T  = triangle count
        Σ over triads of (#edges)  =  m·(n-2)
        path (exactly 2 edges)     =  W - 3T
        one-edge                   =  m·(n-2) - 2·(W-3T) - 3T
        empty                      =  C(n,3) - rest

    Physical shape: one degree groupBy (map-side combined) + the
    degree-oriented triangle join from ``triangle_count.triangles`` —
    nothing here grows faster than the triangle kernel, so the census
    inherits its 100 TB story verbatim. All counts are exact longs
    (C(n,3) overflows int64 only past n ≈ 3.8M·10³ — n itself would
    exceed 10¹² vertices first).
    """
    from incubator_hugegraph_computer_spark.operators.triangle_count import (
        triangles,
        undirected_edges,
    )

    und = undirected_edges(graph.edges).localCheckpoint(eager=True)
    m = und.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    n = graph.vertices.agg(F.count(F.lit(1)).cast("long").alias("n_vertices"))
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    wedges = deg.agg(
        F.sum((F.col("d") * (F.col("d") - 1) / F.lit(2)).cast("long"))
        .cast("long")
        .alias("w")
    )
    tri = triangles(
        und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    ).agg(F.count(F.lit(1)).cast("long").alias("t3"))  # one row per triangle

    out = n.crossJoin(m).crossJoin(wedges).crossJoin(tri)  # one-row × one-row
    t = F.coalesce(F.col("t3"), F.lit(0))
    w = F.coalesce(F.col("w"), F.lit(0))
    path = (w - 3 * t).cast("long")
    one = (F.col("n_edges") * (F.col("n_vertices") - 2) - 2 * path - 3 * t).cast(
        "long"
    )
    total = (
        F.col("n_vertices")
        * (F.col("n_vertices") - 1)
        * (F.col("n_vertices") - 2)
        / F.lit(6)
    ).cast("long")
    return out.select(
        "n_vertices",
        "n_edges",
        (total - one - path - t).cast("long").alias("triads_empty"),
        one.alias("triads_one_edge"),
        path.alias("triads_path"),
        t.alias("triads_triangle"),
    )


def triangle_null_model(graph: Graph) -> DataFrame:
    """One row (n_vertices, n_edges, triangles_obs, triangles_cfg_exp,
    clustering_excess) — the observed triangle count against its
    configuration-model expectation

        E[T] ≈ (Σ d(d−1))³ / (6 · (2m)³)

    (Chung-Lu/configuration null with p_ij ≈ d_i d_j / 2m). The ratio
    obs/exp is the excess-clustering factor — the single number that
    says whether the graph's triangles are degree-sequence artifacts
    (spam rings inflate it far above hub-induced expectation). Three
    degree aggregates + the triangle kernel; nothing new at scale.
    """
    from incubator_hugegraph_computer_spark.operators.triangle_count import (
        triangles,
        undirected_edges,
    )

    und = undirected_edges(graph.edges).localCheckpoint(eager=True)
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    mom = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_vertices"),
        F.sum("d").cast("long").alias("m2"),
        F.sum((F.col("d") * (F.col("d") - 1)).cast("long")).cast("long").alias("s2"),
    )
    tri = triangles(
        und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    ).agg(F.count(F.lit(1)).cast("long").alias("t_obs"))
    return (
        mom.crossJoin(tri)  # one-row × one-row
        .select(
            "n_vertices",
            (F.col("m2") / F.lit(2)).cast("long").alias("n_edges"),
            F.col("t_obs").alias("triangles_obs"),
            # cubes as explicit products: exact doubles on every
            # engine (libm pow() is not guaranteed correctly rounded)
            F.round(
                (F.col("s2").cast("double") * F.col("s2") * F.col("s2"))
                / (F.lit(6.0) * F.col("m2").cast("double") * F.col("m2") * F.col("m2")),
                6,
            ).alias("triangles_cfg_exp"),
            F.round(
                F.col("t_obs")
                / (
                    (F.col("s2").cast("double") * F.col("s2") * F.col("s2"))
                    / (F.lit(6.0) * F.col("m2").cast("double") * F.col("m2") * F.col("m2"))
                ),
                6,
            ).alias("clustering_excess"),
        )
    )
