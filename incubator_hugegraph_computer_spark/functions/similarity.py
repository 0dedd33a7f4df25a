"""Similarity search over embedding columns (array<float>).

- ``cosine_topk`` — brute-force exact top-k: broadcast the (small) query
  set against the corpus; dot products via ``F.zip_with`` +
  ``F.aggregate`` in double precision (JVM expressions — no Python).
  At 100 TB this is the verification baseline and the re-rank stage.
- ``lsh_buckets`` / ``ann_lsh_topk`` — random-hyperplane LSH: the
  hyperplanes are deterministic ±1 weights derived from md5(plane, dim),
  so signatures are reproducible anywhere (and oracle-checkable). Only
  same-bucket pairs are scored — the scale path.
- ``embedding_near_duplicates`` — cosine ≥ τ pairs via LSH buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, vec_id, score, rank) — exact top-k by cosine for each
    query vector. ``queries`` must be broadcast-small (the brute-force
    contract); ties broken by vec_id for determinism."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    corpus = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            cosine(F.col("vec"), F.col("qvec")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _plane_weights(spark, num_planes: int, dim: int) -> DataFrame:
    """(plane, pos, w) deterministic ±1 hyperplane weights:
    w = +1 iff the first hex nibble of md5('plane_pos') >= '8'."""
    planes = spark.range(num_planes).select(F.col("id").cast("int").alias("plane"))
    dims = spark.range(dim).select(F.col("id").cast("int").alias("pos"))
    return planes.crossJoin(dims).select(
        "plane",
        "pos",
        F.when(
            F.substring(F.md5(F.concat_ws("_", F.col("plane"), F.col("pos"))), 1, 1)
            >= F.lit("8"),
            F.lit(1.0),
        )
        .otherwise(F.lit(-1.0))
        .alias("w"),
    )


def lsh_buckets(
    embeddings: DataFrame,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """(vec_id, bucket) — sign pattern of ``num_planes`` random
    hyperplane projections packed into a long. One explode + groupBy;
    weights are broadcast. Pass ``dim`` when known (a 100 TB pipeline
    knows its embedding width); the single-row probe fallback is for
    ad-hoc use only."""
    spark = embeddings.sparkSession
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    weights = _plane_weights(spark, num_planes, dim)
    flat = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(F.col(vec_col)).alias("pos", "x"),
    )
    proj = (
        flat.join(F.broadcast(weights), "pos")
        .groupBy("vec_id", "plane")
        .agg(F.sum(F.col("x").cast("double") * F.col("w")).alias("p"))
    )
    bucket = F.sum(
        F.when(F.col("p") > 0, F.expr("shiftleft(1L, plane)")).otherwise(F.lit(0))
    ).cast("long")
    bucketed = proj.groupBy("vec_id").agg(bucket.alias("bucket"))
    # NULL/empty vectors explode to no rows and would silently vanish
    # from the index (and from every bucket-joined consumer). Keep them
    # visible under a sentinel bucket (-1; real buckets are >= 0) — they
    # can only candidate with each other, and cosine over an empty
    # vector is NULL so no threshold ever admits them.
    missing = embeddings.where(
        F.col(vec_col).isNull() | (F.size(F.col(vec_col)) == 0)
    ).select(F.col(id_col).alias("vec_id"), F.lit(-1).cast("long").alias("bucket"))
    return bucketed.unionAll(missing)


def _cap_hot_buckets(bucketed: DataFrame, max_bucket_size: int | None) -> DataFrame:
    """Drop saturated LSH buckets — the within-bucket join is quadratic,
    so one degenerate bucket (e.g. a mass of near-zero embeddings all
    hashing to the same sign pattern) owns O(n²) of the work at 100 TB.
    Same pattern as the n-gram path's hot-shingle drop
    (``max_shingle_freq``): a bucket that saturated carries no
    discriminative signal anyway. ``None`` disables (exact parity with
    the SQL oracle)."""
    if max_bucket_size is None:
        return bucketed
    hot = (
        bucketed.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > max_bucket_size)
        .select("bucket")
    )
    return bucketed.join(hot, "bucket", "left_anti")


def ann_lsh_topk(
    embeddings: DataFrame,
    k: int = 10,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
    dim: int | None = None,
) -> DataFrame:
    """(query_id, vec_id, score, rank) approximate top-k: score only
    same-bucket pairs. Recall depends on num_planes; the brute-force
    path is the oracle for recall measurement (tests).
    ``max_bucket_size`` drops saturated buckets (see _cap_hot_buckets)."""
    b = _cap_hot_buckets(lsh_buckets(embeddings, num_planes, id_col, vec_col, dim), max_bucket_size)
    # both sides of the bucket self-join read e — persist it or the
    # whole LSH pipeline (explode + two shuffles) runs twice
    e = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")).join(
        b, "vec_id"
    ).persist()
    a = e.select(F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec"), "bucket")
    scored = (
        e.join(a, "bucket")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cosine(F.col("vec"), F.col("qvec")).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .localCheckpoint(eager=True)  # k rows per query; frees e's cache
    )
    e.unpersist()
    return out


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """(query_id, vec_id, score, rank) — IVF-style approximate top-k.

    The scale path for ANN beyond LSH: partition the corpus into
    ``n_centroids`` inverted lists, score a query only against the
    ``n_probe`` lists whose centroids it is closest to. By default
    centroids are chosen **deterministically** (the ``n_centroids``
    lowest-id vectors) so the whole operator is reproducible and
    oracle-checkable; pass ``centroids`` (a (cent_id, cvec) table, e.g.
    :func:`kmeans_centroids` renamed) for trained inverted lists —
    assignment, probing and re-ranking are unchanged either way.

    Physical plan: centroids are broadcast twice (corpus assignment,
    query probing); the candidate join corpus⋈probes is a shuffle hash
    join on ``cell`` — each inverted list is one key group, so work is
    |corpus|/n_centroids × n_probe per query instead of |corpus|.
    """
    if centroids is not None:
        cents = centroids.select("cent_id", "cvec")
    else:
        cents = (
            embeddings.orderBy(F.asc(id_col))
            .limit(n_centroids)
            .select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cvec"))
        )
    corpus = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    # assignment: nearest centroid by cosine, ties → lowest centroid id
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("csim"), F.asc("cent_id")
    )
    assigned = (
        corpus.crossJoin(F.broadcast(cents))
        .select("vec_id", "vec", "cent_id", cosine(F.col("vec"), F.col("cvec")).alias("csim"))
        .withColumn("rn", F.row_number().over(w_assign))
        .where(F.col("rn") == 1)
        .select("vec_id", "vec", F.col("cent_id").alias("cell"))
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("csim"), F.asc("cent_id"))
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select("query_id", "qvec", "cent_id", cosine(F.col("qvec"), F.col("cvec")).alias("csim"))
        .withColumn("rn", F.row_number().over(w_probe))
        .where(F.col("rn") <= n_probe)
        .select("query_id", "qvec", F.col("cent_id").alias("cell"))
    )
    scored = (
        assigned.join(probes.hint("shuffle_hash"), "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cosine(F.col("vec"), F.col("qvec")).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.95,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
    dim: int | None = None,
) -> DataFrame:
    """(vec_a, vec_b, score) cosine ≥ threshold pairs found via LSH
    bucketing (vec_a < vec_b). ``max_bucket_size`` drops saturated
    buckets (see _cap_hot_buckets)."""
    b = _cap_hot_buckets(lsh_buckets(embeddings, num_planes, id_col, vec_col, dim), max_bucket_size)
    e = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")).join(
        b, "vec_id"
    ).persist()
    left = e.select(F.col("vec_id").alias("vec_a"), F.col("vec").alias("va"), "bucket")
    right = e.select(F.col("vec_id").alias("vec_b"), F.col("vec").alias("vb"), "bucket")
    out = (
        left.join(right, "bucket")
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cosine(F.col("va"), F.col("vb")).alias("score"))
        .where(F.col("score") >= threshold)
        .distinct()
        .localCheckpoint(eager=True)  # pair set is small; frees e's cache
    )
    e.unpersist()
    return out


# ------------------------------------------------------------------ k-means
def _sq_dist(a: Column, b: Column) -> Column:
    """Squared L2 distance in double precision, left-to-right fold (the
    same summation order DuckDB's list_sum uses, so oracles replay it)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _lloyd_centroids(emb: DataFrame, k: int, iters: int) -> DataFrame:
    """(cid, cv) after ``iters`` Lloyd rounds over (vec_id, v:double[]).
    Init = the k lowest-id vectors; per round assign (argmin squared-L2,
    ties → lowest cid) then recompute means; empty clusters drop out."""
    w0 = Window.orderBy("vec_id")  # k rows post-limit — not a scale risk
    cents = (
        emb.orderBy("vec_id")
        .limit(k)
        .withColumn("cid", (F.row_number().over(w0) - 1).cast("int"))
        .select("cid", F.col("v").alias("cv"))
    )
    for _ in range(iters):
        d = emb.crossJoin(F.broadcast(cents)).select(
            "vec_id", "cid", _sq_dist(F.col("v"), F.col("cv")).alias("d2")
        )
        assign = (
            d.groupBy("vec_id")
            .agg(F.min(F.struct("d2", "cid")).alias("m"))
            .select("vec_id", F.col("m.cid").alias("cluster"), F.col("m.d2").alias("d2"))
        )
        means = (
            emb.join(assign, "vec_id")
            .select("cluster", F.posexplode("v").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.avg("x").alias("mx"))
        )
        cents = (
            means.groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "mx"))).alias("arr"))
            .select(
                F.col("cluster").alias("cid"),
                F.transform(F.col("arr"), lambda s: s.getField("mx")).alias("cv"),
            )
        )
    return cents


def _emb_view(embeddings, id_col: str, vec_col: str):
    """The shared (vec_id, v double[]) projection every k-means path
    starts from — build it ONCE per operator and pass it down; a second
    call means a second scan+cast of the embedding table."""
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )


def _assign_to(emb, cents):
    """Final cluster assignment: broadcast centroids, argmin via
    min(struct(d2, cid)) — ties to the lowest cluster id."""
    d = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cid", _sq_dist(F.col("v"), F.col("cv")).alias("d2")
    )
    return (
        d.groupBy("vec_id")
        .agg(F.min(F.struct("d2", "cid")).alias("m"))
        .select(
            "vec_id",
            F.col("m.cid").alias("cluster"),
            F.round(F.col("m.d2"), 6).alias("d2"),
        )
    )


def kmeans_centroids(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cid, cv) — the trained Lloyd centroid table alone, for feeding
    :func:`ivf_topk` (trained inverted lists) or any assign-only reuse.
    Same deterministic init/tie rules as :func:`kmeans_assign`."""
    emb = _emb_view(embeddings, id_col, vec_col).persist()
    cents = _lloyd_centroids(emb, k, iters).localCheckpoint(eager=True)  # k rows
    emb.unpersist()
    return cents


def kmeans_assign(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster, d2) — Lloyd's k-means over an embedding column,
    the cluster-then-curate primitive for training-data pipelines (topic
    balancing, SemDeDup-style per-cluster dedup) and the trainer for
    :func:`ivf_topk` centroids.

    Deterministic and oracle-replayable by construction: initial
    centroids are the ``k`` lowest-id vectors (not random), ties in the
    assignment argmin break to the lowest cluster id, and all arithmetic
    is double-precision JVM expressions. Clusters that lose every member
    drop out (standard Lloyd) — both engines see the same assignments so
    the oracle agrees.

    Scale shape per iteration: assignment is a broadcast of the k×dim
    centroid table against the corpus (no shuffle of the embeddings),
    folded to an argmin via ``min(struct(d2, cid))`` — one map-side-
    combined aggregation keyed by vec_id; the centroid update is a
    posexplode to (cluster, dim) cells and one hash aggregation —
    shuffle volume N·dim numbers, the size of the input, with map-side
    partial means. Nothing collects to the driver.
    """
    emb = _emb_view(embeddings, id_col, vec_col).persist()
    cents = _lloyd_centroids(emb, k, iters)
    out = _assign_to(emb, cents).localCheckpoint(eager=True)  # slim N rows
    emb.unpersist()
    return out


def semantic_dedup(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster, keep 0/1, n_lower_dups) — SemDeDup-style
    semantic deduplication (Abbas et al. 2023): cluster the corpus with
    k-means, then within each cluster drop every vector that has a
    LOWER-id neighbor with cosine >= threshold (keep the lowest id of
    each near-duplicate group). Deterministic end to end: k-means init
    and tie-breaks from :func:`kmeans_assign`, the keep rule is a pure
    order comparison.

    Scale shape: the pairwise stage is confined to within-cluster pairs
    — the SemDeDup contract (k grows with corpus size so cluster
    populations stay bounded; ~sqrt(N) clusters keeps the per-cluster
    quadratic term at O(N)). The cluster self-join is a hash join on
    cluster id; AQE splits skewed (oversized) clusters. Nothing
    all-pairs, nothing collects.
    """
    # ONE (vec_id, v) projection feeds training, assignment, and the
    # within-cluster pair stage — not one per sub-call
    emb = _emb_view(embeddings, id_col, vec_col).persist()
    cents = _lloyd_centroids(emb, k, iters)
    assign = _assign_to(emb, cents)
    clustered = assign.select("vec_id", "cluster").join(emb, "vec_id")
    hi = clustered.select(
        F.col("vec_id").alias("__hi"), F.col("cluster").alias("__c"), F.col("v").alias("__hv")
    )
    lo = clustered.select(
        F.col("vec_id").alias("__lo"), F.col("cluster").alias("__c2"), F.col("v").alias("__lv")
    )
    dup_counts = (
        hi.join(lo, (F.col("__c") == F.col("__c2")) & (F.col("__lo") < F.col("__hi")))
        .where(cosine(F.col("__hv"), F.col("__lv")) >= threshold)
        .groupBy(F.col("__hi").alias("vec_id"))
        .agg(F.count(F.lit(1)).alias("n_lower_dups"))
    )
    out = (
        clustered.join(dup_counts, "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            F.when(F.col("n_lower_dups").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("keep"),
            F.coalesce(F.col("n_lower_dups"), F.lit(0)).alias("n_lower_dups"),
        )
        .localCheckpoint(eager=True)  # slim N rows; frees the emb cache
    )
    emb.unpersist()
    return out


def pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    topk: int = 10,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, vec_id, adc, rank) — product-quantization ANN
    (Jégou et al., TPAMI 2011): split each vector into ``m`` subvectors,
    train an independent k-means codebook per subspace (same
    deterministic Lloyd rules as :func:`kmeans_assign`), encode the
    corpus as ``m`` one-byte codes, and answer top-k by Asymmetric
    Distance Computation — the query's exact distance to each centroid
    (an m×k lookup table) summed over the stored codes.

    This is the 100 TB ANN compression path: the corpus is scanned as
    m·log2(k) BITS per vector (here 4 codes ≈ 12 bits vs 64 floats =
    2048 bits, a 170× scan reduction), codebooks and per-query LUTs are
    broadcast (m·k rows each), and the only shuffles are the two
    map-side-combined argmin aggregations (encode keyed by (vec, s),
    ADC keyed by (query, vec)). Training scans the corpus m·iters
    times — a production pipeline trains on a hash-sample and reuses
    the codebook across corpus versions; encoding is one pass.

    Determinism / oracle parity: Lloyd init/ties per
    :func:`kmeans_assign`; the ADC sum folds the m partial distances in
    subspace order (``F.aggregate`` over an array_sort'ed collect_list)
    so both engines add the same doubles in the same order and the
    (adc, vec_id) ranking is bit-identical. The final per-query ranking
    window follows the :func:`cosine_topk` broadcast-small-queries
    contract (production re-ranks per query via two-phase local top-k).
    """
    emb = _emb_view(embeddings, id_col, vec_col).persist()
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d = dim // m

    # --- train: one deterministic Lloyd codebook per subspace
    cents = None
    for s in range(m):
        sub = emb.select("vec_id", F.slice("v", s * d + 1, d).alias("v"))
        cs = _lloyd_centroids(sub, k, iters).select(
            F.lit(s).alias("s"), "cid", "cv"
        )
        cents = cs if cents is None else cents.unionAll(cs)
    cents = cents.localCheckpoint(eager=True)  # m*k rows

    # --- encode: one corpus pass, argmin per (vector, subspace)
    sub_structs = F.array(
        *[F.slice("v", s * d + 1, d) for s in range(m)]
    )
    subrows = emb.select("vec_id", F.posexplode(sub_structs).alias("s", "sv"))
    codes = (
        subrows.join(F.broadcast(cents), "s")
        .select("vec_id", "s", "cid", _sq_dist(F.col("sv"), F.col("cv")).alias("d2"))
        .groupBy("vec_id", "s")
        .agg(F.min(F.struct("d2", "cid")).alias("mn"))
        .select("vec_id", "s", F.col("mn.cid").alias("cid"))
    )

    # --- per-query LUT: exact distance query-subvector → each centroid
    q = _emb_view(queries, id_col, vec_col).select(
        F.col("vec_id").alias("query_id"), "v"
    )
    qsub = q.select(
        "query_id",
        F.posexplode(
            F.array(*[F.slice("v", s * d + 1, d) for s in range(m)])
        ).alias("s", "qv"),
    )
    lut = qsub.join(F.broadcast(cents), "s").select(
        "query_id", "s", "cid", _sq_dist(F.col("qv"), F.col("cv")).alias("qd2")
    )

    # --- ADC: join codes to the broadcast LUT, fold in subspace order
    adc_expr = F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct("s", "qd2"))),
            lambda st: st.getField("qd2"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = (
        codes.join(F.broadcast(lut), ["s", "cid"])
        .groupBy("query_id", "vec_id")
        .agg(adc_expr.alias("adc"))
        .where(F.col("vec_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("vec_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select("query_id", "vec_id", F.round("adc", 6).alias("adc"), "rank")
        .localCheckpoint(eager=True)  # ≤ |queries|·topk rows; frees emb
    )
    emb.unpersist()
    return out


def sq8_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    topk: int = 10,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, vec_id, adc, rank) — scalar-quantization (SQ8) ANN:
    per-dimension [min, max] trained over the corpus, each coordinate
    stored as an 8-bit code ``round((x - min_j) / s_j)`` with
    ``s_j = (max_j - min_j)/255``, and queries answered by asymmetric
    L2 against the DEquantized corpus (the faiss ``SQ8`` layout — the
    first rung of the quantization ladder: no codebook training, 4× the
    scan-rate of float32 at near-full recall, vs PQ's ~170× at lower
    recall).

    Scale shape: the trained stats are ONE row (2·dim doubles) — a
    single map-side-combined aggregate, broadcast back over the scan;
    encoding and scoring are one corpus pass of pure JVM array
    expressions (no shuffle but the final bounded per-query top-k); the
    query side follows the :func:`cosine_topk` broadcast-small-queries
    contract. Determinism / oracle parity: the ADC folds (q_j - recon_j)²
    in dimension order on both engines (``F.aggregate`` over the
    zip == DuckDB ``list_sum`` over ``list_zip``), and quantization uses
    non-negative half-up rounding, identical in Spark and DuckDB.
    """
    emb = _emb_view(embeddings, id_col, vec_col)
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    stats = emb.agg(
        F.array(*[F.min(F.col("v")[j]) for j in range(dim)]).alias("mns"),
        F.array(*[F.max(F.col("v")[j]) for j in range(dim)]).alias("mxs"),
    ).select(
        "mns",
        F.zip_with(
            "mxs",
            "mns",
            lambda mx, mn: F.when(mx > mn, (mx - mn) / F.lit(255.0)).otherwise(
                F.lit(1.0)
            ),
        ).alias("scs"),
    )
    # dequantized corpus: recon_j = mn_j + clamp(round((x_j-mn_j)/s_j))·s_j
    recon_expr = (
        "transform(v, (x, j) -> mns[j] + least(255.0d, greatest(0.0d, "
        "round((x - mns[j]) / scs[j]))) * scs[j])"
    )
    enc = emb.crossJoin(F.broadcast(stats)).select(
        "vec_id", F.expr(recon_expr).alias("recon")
    )
    q = _emb_view(queries, id_col, vec_col).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    diff2 = F.zip_with("qv", "recon", lambda a, b: (a - b) * (a - b))
    scored = (
        enc.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.aggregate(diff2, F.lit(0.0), lambda acc, v: acc + v).alias("adc"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select("query_id", "vec_id", F.round("adc", 6).alias("adc"), "rank")
        .localCheckpoint(eager=True)
    )


def ivfpq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    n_centroids: int = 16,
    probe: int = 4,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    topk: int = 10,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, vec_id, adc, rank) — IVF-PQ, the production ANN
    layout (FAISS ``IVFx,PQy``): a coarse k-means quantizer routes each
    vector to an inverted list, and the RESIDUAL (vector − its coarse
    centroid) is product-quantized. A query probes its ``probe``
    nearest coarse cells and scans only those lists, scoring by ADC
    against a per-(query, cell) lookup table built from the query's
    residual in that cell.

    At 100 TB: the corpus is stored bucketed by coarse cell (partition
    pruning ≈ probe/n_centroids of the data touched) as m·log2(k)-bit
    codes; codebooks (n_centroids·dim + m·k·dim/m doubles) and the
    per-query LUT (|queries|·probe·m·k rows) broadcast. Residual
    encoding is what lets a small PQ codebook stay accurate after
    coarse routing — the standard recall/compression trade.

    Determinism / oracle parity: both k-means stages follow
    :func:`kmeans_assign`'s init/tie rules; residuals are exact double
    subtractions; the probe ranking and final (adc, vec_id) ranking
    order by identically-computed doubles (subspace-ordered folds).
    """
    emb = _emb_view(embeddings, id_col, vec_col).persist()
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d = dim // m

    # --- coarse quantizer + inverted-list assignment
    coarse = _lloyd_centroids(emb, n_centroids, iters).select(
        F.col("cid").alias("bucket"), F.col("cv").alias("bv")
    ).localCheckpoint(eager=True)
    assign = (
        emb.crossJoin(F.broadcast(coarse))
        .select("vec_id", "bucket", _sq_dist(F.col("v"), F.col("bv")).alias("d2"))
        .groupBy("vec_id")
        .agg(F.min(F.struct("d2", "bucket")).alias("mn"))
        .select("vec_id", F.col("mn.bucket").alias("bucket"))
    )
    resid = (
        emb.join(assign, "vec_id")
        .join(F.broadcast(coarse), "bucket")
        .select(
            "vec_id",
            "bucket",
            F.zip_with("v", "bv", lambda x, y: x - y).alias("rv"),
        )
        .persist()
    )

    # --- per-subspace PQ codebooks trained on the residuals
    cents = None
    for s in range(m):
        sub = resid.select("vec_id", F.slice("rv", s * d + 1, d).alias("v"))
        cs = _lloyd_centroids(sub, k, iters).select(F.lit(s).alias("s"), "cid", "cv")
        cents = cs if cents is None else cents.unionAll(cs)
    cents = cents.localCheckpoint(eager=True)  # m*k rows

    # --- encode: argmin per (vector, subspace) over the residual
    subrows = resid.select(
        "vec_id",
        "bucket",
        F.posexplode(F.array(*[F.slice("rv", s * d + 1, d) for s in range(m)])).alias(
            "s", "sv"
        ),
    )
    codes = (
        subrows.join(F.broadcast(cents), "s")
        .select(
            "vec_id", "bucket", "s", "cid",
            _sq_dist(F.col("sv"), F.col("cv")).alias("d2"),
        )
        .groupBy("vec_id", "bucket", "s")
        .agg(F.min(F.struct("d2", "cid")).alias("mn"))
        .select("vec_id", "bucket", "s", F.col("mn.cid").alias("cid"))
    )

    # --- probe: each query's `probe` nearest coarse cells
    q = _emb_view(queries, id_col, vec_col).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    qd = q.crossJoin(F.broadcast(coarse)).select(
        "query_id", "bucket", "qv", "bv",
        _sq_dist(F.col("qv"), F.col("bv")).alias("d2"),
    )
    wp = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("bucket"))
    probed = (
        qd.withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") <= probe)
        .select(
            "query_id", "bucket",
            F.zip_with("qv", "bv", lambda x, y: x - y).alias("qres"),
        )
    )

    # --- per-(query, cell) LUT over the query residual
    qsub = probed.select(
        "query_id",
        "bucket",
        F.posexplode(
            F.array(*[F.slice("qres", s * d + 1, d) for s in range(m)])
        ).alias("s", "qv"),
    )
    lut = qsub.join(F.broadcast(cents), "s").select(
        "query_id", "bucket", "s", "cid",
        _sq_dist(F.col("qv"), F.col("cv")).alias("qd2"),
    )

    # --- ADC over probed lists only (the bucket key IS the IVF filter)
    adc_expr = F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct("s", "qd2"))),
            lambda st: st.getField("qd2"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = (
        codes.join(F.broadcast(lut), ["bucket", "s", "cid"])
        .groupBy("query_id", "vec_id")
        .agg(adc_expr.alias("adc"))
        .where(F.col("vec_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("vec_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select("query_id", "vec_id", F.round("adc", 6).alias("adc"), "rank")
        .localCheckpoint(eager=True)
    )
    resid.unpersist()
    emb.unpersist()
    return out


def mips_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, vec_id, score, rank) — exact top-k by INNER PRODUCT
    (MIPS) per query. The retrieval objective when embeddings encode
    magnitude as importance (recommendation / learned retrievers);
    cosine's normalization erases exactly that signal. Same broadcast-
    small-queries brute-force contract and determinism (ties by
    vec_id) as ``cosine_topk``; at scale, reduce MIPS to cosine by the
    norm-augmentation transform and reuse the IVF/LSH paths.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    corpus = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    )
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            _dot(F.col("vec"), F.col("qvec")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def mrl_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    prefix_dim: int = 16,
    candidates: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, vec_id, score, rank) — Matryoshka-style staged
    retrieval: stage 1 ranks the corpus by cosine over the FIRST
    ``prefix_dim`` dimensions and keeps ``candidates`` per query;
    stage 2 re-ranks only those by full-width cosine and returns the
    top ``k``. With MRL-trained embeddings the prefix is itself a
    valid low-dim embedding, so stage 1 reads 4× fewer floats per
    row — the cheap-scan/exact-re-rank pattern that complements the
    IVF/LSH bucket paths (those prune ROWS; this prunes WIDTH).

    Same broadcast-small-queries contract and (score DESC, vec_id)
    determinism as ``cosine_topk``.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.slice(F.col(vec_col), 1, prefix_dim).alias("qpre"),
    )
    corpus = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        F.slice(F.col(vec_col), 1, prefix_dim).alias("pre"),
    )
    coarse = (
        corpus.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            "vec",
            "qvec",
            cosine(F.col("pre"), F.col("qpre")).alias("cscore"),
        )
    )
    w1 = Window.partitionBy("query_id").orderBy(F.desc("cscore"), F.asc("vec_id"))
    cand = coarse.withColumn("crn", F.row_number().over(w1)).where(
        F.col("crn") <= candidates
    )
    rescored = cand.select(
        "query_id", "vec_id", cosine(F.col("vec"), F.col("qvec")).alias("score")
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return rescored.withColumn("rank", F.row_number().over(w2)).where(
        F.col("rank") <= k
    )
