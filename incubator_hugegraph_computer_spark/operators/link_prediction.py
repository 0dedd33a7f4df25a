"""Link prediction — common-neighbors / Adamic-Adar over 2-hop pairs.

The standard "which edges are missing?" primitive for a link graph
(Liben-Nowell & Kleinberg 2003). For every non-adjacent pair (a, b)
that shares at least one neighbor in the undirected view:

    cn(a,b) = |N(a) ∩ N(b)|
    aa(a,b) = Σ_{z ∈ N(a) ∩ N(b)} 1 / ln(deg(z))

(deg(z) ≥ 2 whenever z is a shared neighbor, so ln is safe.)

Physical shape — candidate generation is the wedge enumeration
(z, a, b) with a < b, NOT an all-pairs product: the neighbor list is
self-joined on the shared intermediary z, so work is Σ_z deg(z)²/2.
That sum is dominated by hubs, which is why ``max_intermediary_degree``
exists: a wedge through a degree-10⁶ hub contributes ~5·10¹¹ pairs and
essentially no signal (everyone shares "google.com"), so web-scale runs
cap the intermediary degree — the same mitigation every production
people-you-may-know pipeline applies. The cap is part of the operator's
declared semantics (the oracle replays it), not a silent truncation.

Top-k selection orders by the INTEGER key (cn DESC, src, dst) — a
deterministic total order immune to float summation-order ties — and
runs as TakeOrdered (orderBy + limit, fully parallel, no single-task
window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from incubator_hugegraph_computer_spark.graph import Graph


def link_prediction(
    graph: Graph,
    top_k: int | None = None,
    max_intermediary_degree: int | None = None,
    min_common: int = 1,
) -> DataFrame:
    """(src, dst, cn, aa) for candidate pairs, strongest first.

    ``top_k=None`` returns all candidates (unordered); with ``top_k``
    the result is the k best under (cn DESC, src ASC, dst ASC).
    """
    sym = graph.symmetrized().edges
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("d"))
    nb = sym.join(deg.withColumnRenamed("id", "src"), "src").select(
        F.col("src").alias("z"), F.col("dst").alias("nbr"), F.col("d").alias("dz")
    )
    if max_intermediary_degree is not None:
        nb = nb.where(F.col("dz") <= max_intermediary_degree)
    a, b = nb.alias("a"), nb.alias("b")
    pairs = (
        a.join(b, (F.col("a.z") == F.col("b.z")) & (F.col("a.nbr") < F.col("b.nbr")))
        .groupBy(
            F.col("a.nbr").alias("src"),
            F.col("b.nbr").alias("dst"),
        )
        .agg(
            F.count(F.lit(1)).alias("cn"),
            F.sum(F.lit(1.0) / F.log(F.col("a.dz").cast("double"))).alias("aa"),
        )
    )
    if min_common > 1:
        pairs = pairs.where(F.col("cn") >= min_common)
    # drop already-existing edges; pairs carry src < dst and sym holds
    # both directions, so one anti-join key orientation suffices
    cand = pairs.join(sym, ["src", "dst"], "left_anti")
    if top_k is not None:
        cand = cand.orderBy(F.desc("cn"), "src", "dst").limit(top_k)
    return cand


def reciprocity(graph: Graph) -> DataFrame:
    """One-row (n_edges, n_reciprocal, reciprocity) — the fraction of
    directed edges whose reverse also exists. The second standard
    one-number structural fingerprint next to assortativity (web link
    graphs ~0.2-0.3, social follow graphs ~0.6+). One self-semi-join on
    (dst, src) + a scalar aggregate — scale-trivial."""
    e = graph.edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = e.join(rev, ["src", "dst"], "left_semi")
    return (
        e.agg(F.count(F.lit(1)).alias("n_edges"))
        .crossJoin(F.broadcast(recip.agg(F.count(F.lit(1)).alias("n_reciprocal"))))
        .select(
            "n_edges",
            "n_reciprocal",
            (F.col("n_reciprocal") / F.col("n_edges")).alias("reciprocity"),
        )
    )


def attribute_assortativity(graph: Graph, attrs: DataFrame) -> DataFrame:
    """One-row (attr_assortativity,) — Newman's categorical mixing
    coefficient (PRE 67, 026126 (2003) eq. 2):

        r = (Σ_i e_ii − Σ_i a_i·b_i) / (1 − Σ_i a_i·b_i)

    over the symmetrized edge list, where e_ij is the fraction of edges
    from attribute i to attribute j and a_i/b_i its marginals. r=1 is
    perfect homophily, 0 random mixing, negative disassortative. The
    homophily companion to ``degree_assortativity``.

    ``attrs``: (id, attr) — one categorical label per vertex.

    Plan: tag edges with both endpoint attributes (two hash joins
    against the V-row attribute table), then three map-side-combined
    aggregates (per-attr src counts, per-attr dst counts, diagonal
    count) composed through one-row scalar crossJoins — no window, no
    all-pairs; scale cost is the two edge⋈attr joins."""
    sym = graph.symmetrized().edges
    a = attrs.select("id", "attr")
    tagged = (
        sym.join(a.select(F.col("id").alias("src"), F.col("attr").alias("asrc")), "src")
        .join(a.select(F.col("id").alias("dst"), F.col("attr").alias("adst")), "dst")
        .select("asrc", "adst")
    )
    totals = tagged.agg(
        F.count(F.lit(1)).cast("double").alias("m"),
        F.sum((F.col("asrc") == F.col("adst")).cast("long")).alias("diag_cnt"),
    )
    cs = tagged.groupBy(F.col("asrc").alias("attr")).agg(F.count(F.lit(1)).alias("cs"))
    cd = tagged.groupBy(F.col("adst").alias("attr")).agg(F.count(F.lit(1)).alias("cd"))
    sab = (
        cs.join(cd, "attr")  # a missing side contributes a zero product
        .agg(F.sum(F.col("cs") * F.col("cd")).alias("sabn"))
    )
    s = F.col("sabn") / (F.col("m") * F.col("m"))
    return totals.crossJoin(sab).select(  # one-row × one-row
        F.round(((F.col("diag_cnt") / F.col("m")) - s) / (F.lit(1.0) - s), 6).alias(
            "attr_assortativity"
        )
    )


def avg_neighbor_degree(graph: Graph) -> DataFrame:
    """(k, knn) — the degree-correlation curve knn(k) (Pastor-Satorras
    et al. 2001): for each degree k, the average over degree-k nodes of
    their mean neighbor degree, on the undirected edge list. The
    function-valued companion to ``degree_assortativity``'s one-number
    summary: decreasing knn(k) = disassortative (web graphs), increasing
    = assortative (social). Two map-side-combined aggregations + one
    edge⋈degree join; output is at most max-degree rows."""
    sym = graph.symmetrized().edges
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("d"))
    dd = deg.select(F.col("id").alias("dst"), F.col("d").alias("d_dst"))
    per_node = (
        sym.join(dd, "dst")
        .groupBy(F.col("src").alias("id"))
        .agg(F.avg("d_dst").alias("annd"))
    )
    return (
        per_node.join(deg, "id")
        .groupBy(F.col("d").alias("k"))
        .agg(F.avg("annd").alias("knn"))
    )


def degree_assortativity(graph: Graph) -> DataFrame:
    """One-row (assortativity,) — Pearson correlation of endpoint
    degrees over the undirected edge list (Newson 2002 r). Positive on
    social graphs, negative on web/biological graphs; the standard
    one-number structural fingerprint. Two shuffles (degree agg + the
    edge⋈degree joins feeding a scalar corr) — scale-trivial."""
    sym = graph.symmetrized().edges
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("d"))
    ds = deg.select(F.col("id").alias("src"), F.col("d").alias("d_src"))
    dd = deg.select(F.col("id").alias("dst"), F.col("d").alias("d_dst"))
    return (
        sym.join(ds, "src")
        .join(dd, "dst")
        .agg(F.corr("d_src", "d_dst").alias("assortativity"))
    )
