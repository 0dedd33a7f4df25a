"""3-clique percolation communities (Palla et al., Nature 435, 2005).

Two triangles are *adjacent* when they share an edge; a k=3 percolation
community is a maximal set of triangles connected under that relation,
and a vertex belongs to every community one of its triangles belongs to
— the canonical OVERLAPPING community model (a page can sit in two
topical clusters at once), which none of the reference's partitioning
algorithms (LPA/Louvain/SLPA) can express. SLPA overlaps by label
multiplicity; percolation overlaps by exact clique structure.

Physical shape:
1. Enumerate triangles with the degree-oriented wedge join
   (``operators/triangle_count.triangles`` — O(Σ deg^{3/2}) work, the
   scale-safe enumeration; NOT the reference's neighbor-set broadcast).
2. Build the *edge adjacency graph*: nodes = the 3 edge keys of each
   triangle, links = the triangle's edge pairs chained (k12—k23,
   k13—k23). Two triangles sharing an edge share that node, so
   triangle-connectivity reduces to plain connectivity — no
   triangle×triangle join ever materializes (that join is quadratic in
   hub regions; the edge-node formulation is linear in triangles).
3. One WCC (min-label, reuses ``operators/wcc.py``) over the edge
   graph; community id = MIN edge key in the component.
4. Map edge keys back to their endpoints → (vertex, community) rows.

Edge keys are ``a * (max_id + 1) + b`` longs — deterministic and
SQL-replayable, which is what makes the community *labels* (not just
the partition) oracle-checkable. At 10^12-vertex scale the product
overflows a long; the scale path swaps the arithmetic key for a
``struct(a, b)`` node id (wcc is key-type agnostic) or mints dense
edge ids at ingest — noted here because the label contract changes
with it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from incubator_hugegraph_computer_spark.graph import Graph
from incubator_hugegraph_computer_spark.operators.triangle_count import triangles
from incubator_hugegraph_computer_spark.operators.wcc import wcc


def clique_percolation3(graph: Graph, max_supersteps: int = 64) -> DataFrame:
    """(id, community) — one row per (vertex, 3-clique community)
    membership; vertices in no triangle emit no rows. ``community`` is
    the minimum edge key of the component (edge key = a*(max_id+1)+b
    over the id-sorted endpoint pair)."""
    tri = triangles(graph.edges)
    # one-row scalar: key modulus (broadcast one-row BNLJ, audit-known)
    m_row = graph.vertices.agg((F.max("id") + 1).alias("_m"))
    keyed = (
        tri.crossJoin(F.broadcast(m_row))
        .select(
            F.array_sort(F.array("v1", "v2", "v3")).alias("s"), "_m"
        )
        .select(
            (F.col("s")[0] * F.col("_m") + F.col("s")[1]).alias("k12"),
            (F.col("s")[0] * F.col("_m") + F.col("s")[2]).alias("k13"),
            (F.col("s")[1] * F.col("_m") + F.col("s")[2]).alias("k23"),
            "_m",
        )
        .persist()
    )
    links = keyed.select(F.col("k12").alias("src"), F.col("k23").alias("dst")).unionAll(
        keyed.select(F.col("k13").alias("src"), F.col("k23").alias("dst"))
    )
    eg = Graph.from_edges(links)
    # The edge-adjacency graph is chain-heavy: percolation chains give
    # it a diameter far beyond the base graph's (measured ≥ 122 at
    # sf0.1, where min-label WCC needs 98 supersteps and silently
    # truncates at any smaller cap). The large-star/small-star
    # contraction converges in O(log n) rounds (8 measured) regardless
    # of diameter — strictly the right inner method here.
    comp = wcc(eg, max_supersteps=max_supersteps, method="contract")
    # map edge keys back to endpoints; community = component label
    m = keyed.select("_m").limit(1)
    members = (
        comp.crossJoin(F.broadcast(m))
        .select(
            F.floor(F.col("id") / F.col("_m")).alias("va"),
            F.pmod(F.col("id"), F.col("_m")).alias("vb"),
            F.col("comp").alias("community"),
        )
    )
    out = (
        members.select(F.col("va").alias("id"), "community")
        .unionAll(members.select(F.col("vb").alias("id"), "community"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    keyed.unpersist()
    return out


def clique_percolation4(graph: Graph, max_supersteps: int = 64) -> DataFrame:
    """(id, community) — k=4 clique percolation (Palla et al., Nature
    435, 2005): two 4-cliques are adjacent when they share a TRIANGLE;
    a community is a maximal set of 4-cliques connected under that
    relation, and a vertex belongs to every community one of its
    4-cliques belongs to. Stricter than k=3 (denser overlap cores,
    fewer/bigger-than-random communities) — the k the original paper
    uses for protein and word association networks.

    Same reduction shape as :func:`clique_percolation3`, one level up:
    nodes = the 4 triangle keys of each 4-clique, links = the clique's
    triangles chained (t123—t124—t134—t234), so clique-connectivity
    reduces to plain connectivity with no clique×clique join. Triangle
    key = ((a·m)+b)·m+c over the id-sorted corner triple — needs
    m³ < 2^63; the scale path swaps it for a ``struct(a,b,c)`` node id
    exactly as the k=3 docstring describes for m². The inner WCC is the
    O(log n) edge contraction (percolation chains = high diameter).
    ``community`` = MIN triangle key of the component.
    """
    from incubator_hugegraph_computer_spark.operators.cliques import k4_cliques

    quads = k4_cliques(graph)
    m_row = graph.vertices.agg((F.max("id") + 1).alias("_m"))

    def tkey(x, y, z):
        return (x * F.col("_m") + y) * F.col("_m") + z

    keyed = (
        quads.crossJoin(F.broadcast(m_row))
        .select(
            tkey(F.col("v1"), F.col("v2"), F.col("v3")).alias("t123"),
            tkey(F.col("v1"), F.col("v2"), F.col("v4")).alias("t124"),
            tkey(F.col("v1"), F.col("v3"), F.col("v4")).alias("t134"),
            tkey(F.col("v2"), F.col("v3"), F.col("v4")).alias("t234"),
        )
        .persist()
    )
    links = (
        keyed.select(F.col("t123").alias("src"), F.col("t124").alias("dst"))
        .unionAll(keyed.select(F.col("t124").alias("src"), F.col("t134").alias("dst")))
        .unionAll(keyed.select(F.col("t134").alias("src"), F.col("t234").alias("dst")))
    )
    comp = wcc(Graph.from_edges(links), max_supersteps=max_supersteps, method="contract")
    m = graph.vertices.agg((F.max("id") + 1).alias("_m")).limit(1)
    # decode with integer `div`, NOT `/`: t-keys approach m³, beyond
    # double's 2^53 exact range, so float division would corrupt ids
    members = comp.crossJoin(F.broadcast(m)).select(
        F.expr("id div (_m * _m)").alias("va"),
        F.expr("(id div _m) % _m").alias("vb"),
        F.expr("id % _m").alias("vc"),
        F.col("comp").alias("community"),
    )
    out = (
        members.select(F.col("va").alias("id"), "community")
        .unionAll(members.select(F.col("vb").alias("id"), "community"))
        .unionAll(members.select(F.col("vc").alias("id"), "community"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    keyed.unpersist()
    return out


def percolation_summary(graph: Graph, max_supersteps: int = 64) -> DataFrame:
    """One row per community: (community, n_vertices) — plus implicit
    overlap statistics downstream (a vertex counted in several rows)."""
    mem = clique_percolation3(graph, max_supersteps=max_supersteps)
    return mem.groupBy("community").agg(F.count(F.lit(1)).alias("n_vertices"))
