"""Statistics post-pass operators.

Reference: Vermeer's per-run statistics workers —
``vermeer/apps/compute/statistics.go:30-55``: count, modularity, top_k,
sketches. Each is a single aggregation pass over the result + graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from incubator_hugegraph_computer_spark.graph import Graph
from incubator_hugegraph_computer_spark.operators.triangle_count import undirected_edges


def top_k_by(df: DataFrame, value_col: str, k: int = 10) -> DataFrame:
    """Top-k rows by value (StatisticsTypeTopK); deterministic tie-break
    on id.

    Physical shape: ``orderBy(...).limit(k)`` compiles to TakeOrdered —
    each partition keeps its own top-k heap, the driver merges k·P rows.
    No global Window.orderBy (that would funnel every row through one
    task); the rank column is stamped by a window over the already-
    reduced k-row result, which is trivially cheap."""
    top = df.orderBy(F.desc(value_col), F.asc("id")).limit(k)
    w = Window.orderBy(F.desc(value_col), F.asc("id"))
    return top.withColumn("rnk", F.row_number().over(w))


def modularity(graph: Graph, assignment: DataFrame, label_col: str = "comp") -> DataFrame:
    """Newman modularity of a vertex partition over the undirected
    deduplicated graph: Q = Σ_c [ m_c/m − (d_c / 2m)² ].

    One row: (modularity double). assignment: (id, <label_col>).
    """
    und = undirected_edges(graph.edges).persist()
    m = und.count()
    if m == 0:
        # division by m below would yield NaN; an edgeless partition's
        # modularity is 0 by convention
        und.unpersist()
        return graph.spark.createDataFrame([(0.0,)], "modularity double")
    la = assignment.select(F.col("id").alias("a"), F.col(label_col).alias("ca"))
    lb = assignment.select(F.col("id").alias("b"), F.col(label_col).alias("cb"))
    labelled = und.join(la, "a").join(lb, "b")
    internal = (
        labelled.where(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("c"))
        .agg(F.count(F.lit(1)).alias("m_c"))
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    deg_c = (
        assignment.join(deg, "id", "left")
        .groupBy(F.col(label_col).alias("c"))
        .agg(F.sum(F.coalesce(F.col("deg"), F.lit(0))).alias("d_c"))
    )
    per_c = deg_c.join(internal, "c", "left").select(
        (
            F.coalesce(F.col("m_c"), F.lit(0)).cast("double") / F.lit(float(m))
            - F.pow(F.col("d_c").cast("double") / F.lit(2.0 * m), 2)
        ).alias("q_c")
    )
    out = per_c.agg(F.sum("q_c").alias("modularity")).localCheckpoint(eager=True)
    und.unpersist()  # one-row result materialized; free the edge cache
    return out


def degree_sketch(graph: Graph, direction: str = "both") -> DataFrame:
    """One-row summary of the degree distribution — the analogue of
    Vermeer's sketch statistics workers (``statistics.go:35-55``,
    StatisticsTypeSketchDegree/Count). Exact closed-form aggregates
    (count_distinct + interpolated percentiles) so an external SQL
    oracle can verify the row bit-for-bit; the HLL/approx variant for
    100 TB-scale runs is :func:`degree_sketch_approx`.

    (n_vertices, n_edges, avg_degree, p50, p90, p99, max_degree)
    """
    deg = graph.degrees(direction)
    n_e = graph.num_edges()
    d = F.col("degree").cast("double")
    return deg.agg(
        F.count_distinct("id").alias("n_vertices"),
        F.lit(n_e).cast("long").alias("n_edges"),
        F.round(F.avg("degree"), 6).alias("avg_degree"),
        F.round(F.percentile(d, F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile(d, F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile(d, F.lit(0.99)), 6).alias("p99"),
        F.max("degree").alias("max_degree"),
    )


def degree_sketch_approx(graph: Graph, direction: str = "both") -> DataFrame:
    """Approximate variant of :func:`degree_sketch` — HLL distinct count
    + t-digest quantiles, single-pass mergeable sketches that stay cheap
    at any scale (the shape Vermeer's sketch workers actually compute).
    Not oracle-gated (approx results are engine-specific by nature).

    (n_vertices_approx, n_edges, avg_degree, p50, p90, p99, max_degree)
    """
    deg = graph.degrees(direction)
    n_e = graph.num_edges()
    return deg.agg(
        F.approx_count_distinct("id").alias("n_vertices_approx"),
        F.lit(n_e).cast("long").alias("n_edges"),
        F.round(F.avg("degree"), 6).alias("avg_degree"),
        F.percentile_approx("degree", 0.5).alias("p50"),
        F.percentile_approx("degree", 0.9).alias("p90"),
        F.percentile_approx("degree", 0.99).alias("p99"),
        F.max("degree").alias("max_degree"),
    )


def graph_counts(graph: Graph) -> DataFrame:
    """(n_vertices, n_edges) — the count statistics worker."""
    n_v = graph.num_vertices()
    n_e = graph.num_edges()
    return graph.spark.createDataFrame(
        [(n_v, n_e)], "n_vertices long, n_edges long"
    )


def value_sketch(df: DataFrame, value_col: str) -> DataFrame:
    """One-row sketch of any per-vertex integer result column — the
    analogue of Vermeer's sketch_depth / sketch_count statistics workers
    (``statistics.go:38-40``: a per-value histogram reduced on the
    master to avg / dispersion / min / max). The histogram reduction is
    expressed directly as the closed-form aggregates so the output is
    exact and oracle-checkable:

    (n, n_distinct, avg, dispersion (= population variance), min, max)
    """
    c = F.col(value_col).cast("double")
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col(value_col)).alias("n_distinct"),
        F.round(F.avg(c), 6).alias("avg"),
        F.round(F.var_pop(c), 6).alias("dispersion"),
        F.min(F.col(value_col)).alias("min"),
        F.max(F.col(value_col)).alias("max"),
    )


def powerlaw_alpha(graph: Graph, dmin: int = 2, direction: str = "in") -> DataFrame:
    """One-row (dmin, n_tail, alpha) — continuous-approximation Hill /
    MLE estimate of the power-law exponent of the degree distribution
    (Clauset, Shalizi & Newman 2009, eq. 3.7):

        alpha = 1 + n / Σ ln(d_i / (dmin - 0.5))

    over the n vertices with degree >= dmin. Web graphs are power-law
    in in-degree, so that is the default tail. One map-side-combined
    degree count + one scalar aggregate — a whole-graph report at any
    scale (beyond-reference, SURVEY.md §2.10)."""
    if direction == "in":
        ids = graph.edges.select(F.col("dst").alias("id"))
    elif direction == "out":
        ids = graph.edges.select(F.col("src").alias("id"))
    else:
        ids = graph.edges.select(F.col("src").alias("id")).unionAll(
            graph.edges.select(F.col("dst").alias("id"))
        )
    deg = ids.groupBy("id").agg(F.count(F.lit(1)).alias("deg"))
    return (
        deg.where(F.col("deg") >= dmin)
        .agg(
            F.count(F.lit(1)).alias("n_tail"),
            F.sum(F.log(F.col("deg") / F.lit(dmin - 0.5))).alias("_s"),
        )
        .select(
            F.lit(dmin).cast("long").alias("dmin"),
            "n_tail",
            (F.lit(1.0) + F.col("n_tail") / F.col("_s")).alias("alpha"),
        )
    )


def component_size_distribution(graph: Graph, **wcc_kwargs) -> DataFrame:
    """(size, n_components) — histogram of weakly-connected-component
    sizes, the classic giant-component census of a crawl snapshot. One
    WCC pass + two bounded map-side-combined aggregations."""
    from incubator_hugegraph_computer_spark.operators.wcc import wcc

    comp = wcc(graph, **wcc_kwargs)
    return (
        comp.groupBy("comp")
        .agg(F.count(F.lit(1)).alias("size"))
        .groupBy("size")
        .agg(F.count(F.lit(1)).alias("n_components"))
    )


def partition_stats(graph: Graph, assignment=None, k: int = 32) -> DataFrame:
    """(pid, n_vertices, internal_edges, cut_edges) — partition-quality
    report for a vertex→partition assignment (default: the modulo
    partitioner pid = id % k). cut_edges counts directed edges LEAVING
    the partition; Σ cut / |E| is the shuffle fraction every
    message-pass superstep pays under that placement, and the
    n_vertices spread is the straggler bound — the two numbers that
    decide whether a 100 TB graph needs bucketing/salting before the
    first superstep runs (SURVEY §1.5's partitioning model made
    measurable).

    ``assignment``: optional (id, pid) frame (e.g. a louvain/leiden
    community map relabeled to partitions, or a graph_store bucket
    map) — quality of CUSTOM placements is the actual use case; the
    modulo default is the oracle-replayable baseline.

    Scale shape: one V-row map join onto each edge endpoint (broadcast
    when the assignment is small, shuffle-hash otherwise) + two
    map-side-combined aggregations. No windows, no collects.
    """
    from pyspark.sql import functions as F

    if assignment is None:
        assignment = graph.vertices.select(
            "id", (F.col("id") % k).cast("long").alias("pid")
        )
    pa = assignment.select(F.col("id").alias("src"), F.col("pid").alias("p_src"))
    pb = assignment.select(F.col("id").alias("dst"), F.col("pid").alias("p_dst"))
    tagged = graph.edges.select("src", "dst").join(pa, "src").join(pb, "dst")
    edge_stats = tagged.groupBy(F.col("p_src").alias("pid")).agg(
        F.sum((F.col("p_src") == F.col("p_dst")).cast("long")).alias("internal_edges"),
        F.sum((F.col("p_src") != F.col("p_dst")).cast("long")).alias("cut_edges"),
    )
    v_stats = assignment.groupBy("pid").agg(F.count(F.lit(1)).alias("n_vertices"))
    return v_stats.join(edge_stats, "pid", "left").select(
        "pid",
        "n_vertices",
        F.coalesce("internal_edges", F.lit(0)).alias("internal_edges"),
        F.coalesce("cut_edges", F.lit(0)).alias("cut_edges"),
    )


def vertex_cut_stats(graph: Graph, rows: int = 4, cols: int = 4) -> DataFrame:
    """Vertex-cut (PowerGraph-style) placement quality vs. the 1-D
    edge-hash baseline — one row per strategy:
    (strategy, n_shards, max_shard_edges, replication_x1m).

    Edge-partitioning is the standard answer to power-law skew that
    edge-CUT placement (``partition_stats``) can't fix: a hub vertex's
    edges are SPLIT across shards and its state replicated.  The 2-D
    grid rule shards edge (u,v) → (h(u) mod R, h(v) mod C), bounding
    every vertex's replication by R+C-1 regardless of degree — the
    property that makes supersteps survive 10⁹-degree hubs at 10¹²
    edges. The 1-D baseline (shard = h(u,v) mod R·C) bounds nothing:
    a hub replicates onto min(deg, R·C) shards.

    ``replication_x1m`` is the average number of shard copies per
    vertex ×10⁶ as an exact long (sum_of_distinct_shard_memberships,
    scaled — kept integral so the oracle comparison is float-free).
    Hashes are md5-derived, replayed bit-identically by the oracle.

    Scale shape: two map-only projections + groupBy distinct on
    (vertex, shard) — map-side combined, no joins at all; the report
    itself costs one pass over E.
    """
    from pyspark.sql import functions as F

    p = rows * cols

    def h(col, salt):
        return F.conv(
            F.substring(F.md5(F.concat_ws(":", col.cast("string"), F.lit(salt))), 1, 8),
            16,
            10,
        ).cast("long")

    e = graph.edges.select("src", "dst")
    grid = e.select(
        "src",
        "dst",
        ((h(F.col("src"), "r") % rows) * cols + (h(F.col("dst"), "c") % cols)).alias(
            "shard"
        ),
    )
    oned = e.select(
        "src",
        "dst",
        (h(F.concat_ws("-", F.col("src"), F.col("dst")), "e") % p).alias("shard"),
    )

    def report(tagged, name):
        load = tagged.groupBy("shard").agg(F.count(F.lit(1)).alias("m"))
        mx = load.agg(F.max("m").cast("long").alias("max_shard_edges"))
        members = (
            tagged.select(F.col("src").alias("id"), "shard")
            .unionAll(tagged.select(F.col("dst").alias("id"), "shard"))
            .distinct()
        )
        rep = members.groupBy("id").agg(F.count(F.lit(1)).alias("r"))
        nv = graph.vertices.agg(F.count(F.lit(1)).alias("nv"))
        avg = rep.agg(F.sum("r").cast("long").alias("copies"))
        return (
            mx.crossJoin(avg)
            .crossJoin(nv)  # one-row × one-row
            .select(
                F.lit(name).alias("strategy"),
                F.lit(p).cast("long").alias("n_shards"),
                "max_shard_edges",
                # integer DIV: floor semantics match DuckDB's // exactly
                # (a double divide + cast would round vs truncate apart)
                F.expr("copies * CAST(1000000 AS BIGINT) DIV nv").alias(
                    "replication_x1m"
                ),
            )
        )

    return report(grid, "grid2d").unionAll(report(oned, "edge_hash_1d"))


def clustering_agreement(
    a: DataFrame, b: DataFrame, la: str = "la", lb: str = "lb"
) -> DataFrame:
    """One row (n, ari, nmi): Adjusted Rand Index and Normalized Mutual
    Information between two vertex labelings — the standard agreement
    metrics for comparing community structures (louvain vs lpa, crawl
    vs crawl, algorithm vs ground truth) WITHOUT materializing the
    O(n²) pair space: both reduce to the (label_a, label_b) contingency
    table (bounded by distinct label pairs), pair counts via C(·,2).

    ``a``: (id, la), ``b``: (id, lb) over the same id set. ARI's
    pair-count sums are exact longs; the two final ratios and NMI's
    log terms are the only floats (summed per contingency cell —
    same summation-order ULP class as every other float oracle here).

    Scale: one co-partitioned join + three map-side-combined groupBys;
    no windows, no collects, nothing grows with pair count.
    """
    from pyspark.sql import functions as F

    j = a.select("id", la).join(b.select("id", lb), "id")
    cont = j.groupBy(la, lb).agg(F.count(F.lit(1)).alias("nij"))
    n_row = j.agg(F.count(F.lit(1)).cast("long").alias("n"))

    def c2(col):
        return (col * (col - 1) / F.lit(2)).cast("long")

    sum_ij = cont.agg(F.sum(c2(F.col("nij"))).cast("long").alias("sij"))
    ai = cont.groupBy(la).agg(F.sum("nij").alias("ai"))
    bj = cont.groupBy(lb).agg(F.sum("nij").alias("bj"))
    sum_a = ai.agg(F.sum(c2(F.col("ai"))).cast("long").alias("sa"))
    sum_b = bj.agg(F.sum(c2(F.col("bj"))).cast("long").alias("sb"))

    # NMI terms: per-cell mutual information + marginal entropies
    cm = cont.join(ai, la).join(bj, lb).crossJoin(F.broadcast(n_row))
    mi = cm.agg(
        F.sum(
            (F.col("nij") / F.col("n"))
            * F.log(
                F.col("n") * F.col("nij") / (F.col("ai") * F.col("bj"))
            )
        ).alias("mi")
    )
    ha = (
        ai.crossJoin(F.broadcast(n_row))
        .agg(F.sum(-(F.col("ai") / F.col("n")) * F.log(F.col("ai") / F.col("n"))).alias("ha"))
    )
    hb = (
        bj.crossJoin(F.broadcast(n_row))
        .agg(F.sum(-(F.col("bj") / F.col("n")) * F.log(F.col("bj") / F.col("n"))).alias("hb"))
    )

    out = (
        n_row.crossJoin(sum_ij)  # one-row × one-row chain
        .crossJoin(sum_a)
        .crossJoin(sum_b)
        .crossJoin(mi)
        .crossJoin(ha)
        .crossJoin(hb)
    )
    cn2 = (F.col("n") * (F.col("n") - 1) / F.lit(2)).cast("long")
    expected = F.col("sa").cast("double") * F.col("sb") / cn2
    max_idx = (F.col("sa") + F.col("sb")) / F.lit(2.0)
    return out.select(
        "n",
        F.round((F.col("sij") - expected) / (max_idx - expected), 6).alias("ari"),
        F.round(F.col("mi") / F.sqrt(F.col("ha") * F.col("hb")), 6).alias("nmi"),
    )


def joint_degree_matrix(graph: Graph) -> DataFrame:
    """(dlo, dhi, n_edges) — the joint degree matrix over log2 degree
    buckets: for every undirected edge, bucket the two endpoint
    degrees (b = floor(log2 d)) and count edges per unordered bucket
    pair. THE null-model fingerprint of degree-degree mixing (finer
    than the scalar assortativity: it shows WHERE hubs attach), and
    the input to 2K-series graph generators used for synthetic
    benchmark corpora.

    One degree groupBy + one edge tag + one count — all map-side
    combined; the output is O(log²(max_degree)) rows at any scale.
    """
    from pyspark.sql import functions as F

    und = undirected_edges(graph.edges)
    deg = (
        und.select(F.col("a").alias("id"))
        .unionAll(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # floor(log2 d) via the binary-string length — integer-exact on
    # both engines (float log2 can land a hair under at powers of two)
    bkt = (F.length(F.bin("d")) - 1).cast("long")
    da = deg.select(F.col("id").alias("a"), bkt.alias("ba"))
    db = deg.select(F.col("id").alias("b"), bkt.alias("bb"))
    return (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.least("ba", "bb").alias("dlo"), F.greatest("ba", "bb").alias("dhi")
        )
        .groupBy("dlo", "dhi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    )
