"""Local-similarity graph sparsification (Satuluri, Parthasarathy,
Ruan — "Local graph sparsification for scalable clustering", SIGMOD'11).

Before running community detection on a 100 TB link graph, drop the
low-similarity edges: for each vertex of degree d keep only its top
ceil(d^e) incident edges ranked by endpoint Jaccard similarity. The
global ranking preserves intra-cluster edges (high common-neighborhood)
and prunes noise edges, shrinking the edge set superlinearly for hubs
while keeping every vertex connected to its most-embedded neighbors.
An edge survives if EITHER endpoint keeps it (the paper's union rule).

Physical shape: common-neighbor counts reuse the degree-oriented truss
support join (no all-pairs work); the per-vertex top-ceil(d^e) is a
window partitioned by the vertex id — hash-distributed, never a single
partition; ranking happens on the exact (unrounded) similarity in both
engines so the cut is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from incubator_hugegraph_computer_spark.graph import Graph
from incubator_hugegraph_computer_spark.operators.structure import edge_embeddedness


def local_sparsify(graph: Graph, e: float = 0.5) -> DataFrame:
    """(a, b, jaccard) — the canonical undirected edges kept by the
    top-ceil(d^e) local-similarity rule. ``jaccard`` = common /
    (deg_a + deg_b - common), rounded to 6 dp for display (ranking uses
    the exact value; ties break toward the lower neighbor id)."""
    sym = graph.symmetrized().edges  # distinct, self-loops dropped
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    emb = edge_embeddedness(graph)  # (a, b, embeddedness) canonical a<b
    sim = (
        emb.join(deg.select(F.col("id").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("id").alias("b"), F.col("deg").alias("db")), "b")
        .select(
            "a",
            "b",
            (
                F.col("embeddedness")
                / (F.col("da") + F.col("db") - F.col("embeddedness"))
            ).alias("sim"),
        )
    )
    # directed view: each endpoint ranks its own incident edges
    directed = sim.select(F.col("a").alias("u"), F.col("b").alias("v"), "sim").unionByName(
        sim.select(F.col("b").alias("u"), F.col("a").alias("v"), "sim")
    )
    w = Window.partitionBy("u").orderBy(F.col("sim").desc(), F.col("v").asc())
    kept_dir = (
        directed.withColumn("rn", F.row_number().over(w))
        .join(deg.select(F.col("id").alias("u"), "deg"), "u")
        .where(F.col("rn") <= F.ceil(F.pow(F.col("deg"), F.lit(float(e)))))
        .select(
            F.least("u", "v").alias("a"),
            F.greatest("u", "v").alias("b"),
        )
        .distinct()
    )
    return kept_dir.join(sim, ["a", "b"]).select(
        "a", "b", F.round("sim", 6).alias("jaccard")
    )
