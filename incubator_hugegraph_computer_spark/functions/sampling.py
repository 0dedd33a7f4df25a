"""Deterministic hash-based sampling for training-data pipelines.

Every draw is a pure function of the row id: ``u(id) = the first 8 hex
chars of md5(id)``, compared lexicographically against a fixed-width
hex threshold. Hex-string order equals numeric order at equal width, so
``u < hex_threshold(rate)`` keeps a ``rate`` fraction of rows — with no
floating point, no RNG state, and bit-identical results in any engine
that has md5 (Spark, DuckDB, Python) — the property that makes samples
reproducible across reruns, resumable mid-pipeline, and oracle-checkable.

At 100 TB all three operators are embarrassingly parallel: one scan, a
per-row hash, a string compare — no shuffle at all (whole-stage codegen
keeps them in one JVM stage), so they compose for free in front of any
heavier operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_HEX_W = 8
_HEX_SPACE = 16 ** _HEX_W


def hex_threshold(rate: float) -> str:
    """The 8-hex-char threshold t with P[md5_prefix < t] = rate.
    rate >= 1 returns 'g' (lexicographically above every hex string);
    rate <= 0 returns '00000000' (below-or-equal to none)."""
    if rate >= 1.0:
        return "g"
    if rate <= 0.0:
        return "0" * _HEX_W
    return format(int(rate * _HEX_SPACE), f"0{_HEX_W}x")


def hash_uniform(id_col: Column) -> Column:
    """The u(id) hash prefix as a string column (ids cast to string so
    integer and string ids hash identically everywhere). A NULL id draws
    as the empty string — deterministic and engine-independent — rather
    than poisoning every comparison to NULL (which would silently drop
    the row in a filter but route it to the LAST band in a CASE)."""
    return F.substring(F.md5(F.coalesce(id_col.cast("string"), F.lit(""))), 1, _HEX_W)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep a per-stratum fraction of rows: rate = rates[stratum] (or
    ``default_rate`` for strata not listed). The standard mixture-
    rebalancing primitive (e.g. downsample 'en' web text, keep all
    low-resource languages). Same id ⇒ same decision regardless of how
    the strata map changes, so mixtures can be re-tuned without
    re-drawing the whole corpus.
    """
    u = hash_uniform(F.col(id_col))
    thr = F.coalesce(
        *(
            [
                F.when(F.col(strata_col) == s, F.lit(hex_threshold(r)))
                for s, r in sorted(rates.items())
            ]
            + [F.lit(hex_threshold(default_rate))]
        )
    )
    return df.where(u < thr)


def hash_split(
    df: DataFrame,
    weights: tuple[float, float, float] = (0.8, 0.1, 0.1),
    names: tuple[str, str, str] = ("train", "val", "test"),
    id_col: str = "doc_id",
) -> DataFrame:
    """Append a deterministic ``split`` column partitioning rows into
    train/val/test by cumulative hash-threshold bands. Disjoint and
    exhaustive by construction; stable under reshuffles, re-ingests and
    engine changes — the property a 100 TB train/eval split must have
    (a re-run may NOT move a document across the eval boundary).
    """
    t1 = hex_threshold(weights[0])
    t2 = hex_threshold(weights[0] + weights[1])
    u = hash_uniform(F.col(id_col))
    return df.withColumn(
        "split",
        F.when(u < F.lit(t1), F.lit(names[0]))
        .when(u < F.lit(t2), F.lit(names[1]))
        .otherwise(F.lit(names[2])),
    )


def domain_mix(
    df: DataFrame,
    targets: dict[str, float],
    domain_col: str = "lang",
    id_col: str = "doc_id",
    weight_col: str | None = None,
) -> DataFrame:
    """Downsample to a target domain mixture — the training-data
    mixture-weights primitive (e.g. "the pretraining mix is 60% web /
    30% code / 10% reference"): given target shares per domain, keep the
    LARGEST corpus achievable by pure downsampling in exactly those
    proportions, and decide every row by the same deterministic id-hash
    as the other samplers.

      budget   T      = min_d  count_d / share_d   (binding domain keeps all)
      rate_d          = share_d · T / count_d      (∈ (0, 1])
      keep row  ⇔  u(id) < threshold(rate_d)

    Domains absent from ``targets`` are dropped (share 0). Shares need
    not sum to 1 — only ratios matter. Expected output size is T·Σshare.

    ``weight_col`` switches the mixture unit from documents to a mass
    column (token counts, byte sizes): count_d becomes Σweight per
    domain, so the EXPECTED OUTPUT MASS hits the target proportions —
    what a training mix actually specifies ("30% of tokens are code",
    not "30% of documents"). Keep/drop stays a per-row id-hash draw.

    Scale shape: one tiny groupBy(domain) count (map-side combined, a
    handful of rows), its min() as a one-row broadcast, then the same
    scan + hash + string-compare as ``stratified_sample`` — no data
    shuffle at 100 TB. The per-row threshold is data-dependent (rates
    derive from observed counts), computed in-plan: the hex threshold is
    formatted from rate with the same floor/format every SQL engine
    reproduces bit-for-bit.
    """
    if not targets:
        raise ValueError("domain_mix needs at least one target share")
    share = _share_of(targets, F.col(domain_col))
    mass = (
        F.sum(F.col(weight_col).cast("double"))
        if weight_col is not None
        else F.count(F.lit(1)).cast("double")
    )
    counts = (
        df.where(share > 0)
        .groupBy(F.col(domain_col).alias("__dom"))
        .agg(mass.alias("__cnt"))
        .withColumn("__share", _share_of(targets, F.col("__dom")))
    )
    budget = counts.agg(F.min(F.col("__cnt") / F.col("__share")).alias("__t"))
    rate = F.col("__share") * F.col("__t") / F.col("__cnt")
    thr = F.when(rate >= 1.0, F.lit("g")).otherwise(
        F.format_string(
            "%08x", F.floor(rate * F.lit(float(_HEX_SPACE))).cast("long")
        )
    )
    return (
        df.join(
            F.broadcast(counts), F.col(domain_col) == F.col("__dom"), "inner"
        )
        .crossJoin(F.broadcast(budget))
        .where(hash_uniform(F.col(id_col)) < thr)
        .drop("__dom", "__cnt", "__share", "__t")
    )


def _share_of(targets: dict[str, float], dom: Column) -> Column:
    return F.coalesce(
        *(
            [F.when(dom == d, F.lit(float(s))) for d, s in sorted(targets.items())]
            + [F.lit(0.0)]
        )
    )


def quantile_buckets(
    df: DataFrame,
    value_col: str,
    domain_col: str = "lang",
    probs: tuple[float, float] = (0.25, 0.75),
    names: tuple[str, str, str] = ("tail", "middle", "head"),
) -> DataFrame:
    """Append a per-domain quantile ``bucket`` column — the CCNet-style
    curation primitive ("keep the head tercile per language, drop the
    tail"): thresholds are computed WITHIN each domain so a verbose
    language doesn't push every short-form language into the tail.

    Buckets: value ≤ q_lo → tail, ≤ q_hi → middle, else head, with
    (q_lo, q_hi) the interpolated ``probs`` quantiles of ``value_col``
    per domain (Spark ``percentile`` == DuckDB ``quantile_cont``, both
    (1−g)·lo + g·hi at pos p·(n−1)).

    Scale shape: one groupBy(domain) percentile agg (domains are few —
    the result broadcasts), then a broadcast join + a codegen'd CASE on
    the scan. No window, no global sort, no per-domain single task.
    """
    v = F.col(value_col).cast("double")
    th = df.groupBy(F.col(domain_col).alias("__dom")).agg(
        F.percentile(v, F.lit(float(probs[0]))).alias("__q_lo"),
        F.percentile(v, F.lit(float(probs[1]))).alias("__q_hi"),
    )
    bucket = (
        F.when(v <= F.col("__q_lo"), F.lit(names[0]))
        .when(v <= F.col("__q_hi"), F.lit(names[1]))
        .otherwise(F.lit(names[2]))
    )
    # null-safe join key: a NULL domain forms its own stratum (groupBy
    # keeps the NULL group) instead of vanishing through an equi-join
    return (
        df.join(F.broadcast(th), F.col(domain_col).eqNullSafe(F.col("__dom")))
        .withColumn("bucket", bucket)
        .drop("__dom", "__q_lo", "__q_hi")
    )


def dsir_logweights(
    documents: DataFrame,
    target_pred: Column,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, dsir_logweight) — hashed-unigram importance
    log-weight ln p_target(doc) − ln p_raw(doc) for Data Selection via
    Importance Resampling (Xie et al. 2023, arXiv:2302.03169): score
    every raw document by how target-domain-like its token distribution
    is, then resample ∝ exp(weight) (the draw itself is the trivial
    downstream md5 coin — this operator is the scoring pass).

    Feature space = the first-2-hex-chars md5 bucket of each token (256
    hashed-unigram buckets — DSIR's hashed n-gram trick, which bounds
    LM state at any corpus size and is engine-independent for the
    oracle). Both bucket LMs are add-one smoothed:

        lr(b) = ln((ct_b+1)/(T+256)) − ln((cr_b+1)/(R+256))
        dsir_logweight(doc) = Σ_{tok ∈ doc} lr(bucket(tok))

    where ct/cr are target/raw bucket counts and T/R the token totals.
    Token-less documents weigh 0.0 (empty product).

    Scale shape: one token explode feeds ONE map-side-combined aggregate
    over ≤256 bucket keys; the 256-row log-ratio table broadcast-joins
    back onto the token stream into a per-doc keyed agg — no window, no
    Python, shuffle bounded by distinct (doc, bucket) pairs. The target
    LM trains on the SAME scan via a flag column (no second pass over
    100 TB to read the target sample)."""
    from incubator_hugegraph_computer_spark.functions.text import _tokens

    buckets = 256.0
    toks = documents.select(
        "doc_id",
        target_pred.cast("long").alias("_t"),
        F.explode(_tokens(F.col(text_col))).alias("term"),
    ).withColumn("bk", F.substring(F.md5(F.col("term")), 1, 2))
    bs = toks.groupBy("bk").agg(
        F.count(F.lit(1)).alias("cr"), F.sum("_t").alias("ct")
    )
    tot = bs.agg(
        F.sum("cr").cast("double").alias("_r"), F.sum("ct").cast("double").alias("_t")
    )
    lr = bs.crossJoin(F.broadcast(tot)).select(
        "bk",
        (
            F.log((F.col("ct") + 1.0) / (F.col("_t") + F.lit(buckets)))
            - F.log((F.col("cr") + 1.0) / (F.col("_r") + F.lit(buckets)))
        ).alias("lw"),
    )
    dw = (
        toks.join(F.broadcast(lr), "bk")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("lw").alias("w"))
    )
    return documents.select("doc_id").join(dw, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.round(F.coalesce("w", F.lit(0.0)), 6).alias("dsir_logweight"),
    )


def shuffle_shards(docs, key_col: str = "doc_id", prefix_len: int = 2,
                   salt: str = "shuffle-v1"):
    """Deterministic global training-data shuffle: every row gets a
    pseudo-random ``shard`` (hex-prefix bucket of a salted md5, so
    16**prefix_len shards) and a total-order ``shuffle_key`` within it.

    A training run wants documents in an order uncorrelated with crawl
    or ingest order; md5 over a salted key gives exactly that, is
    reproducible across engines (Spark/DuckDB/Python all agree on md5 —
    the same property the split/sample operators lean on), and changing
    the salt yields a fresh independent permutation per epoch.

    Scale path: NO global row-number exists anywhere — the writer is
    ``df.repartition(shard).sortWithinPartitions(shuffle_key)``, which
    is one shuffle keyed on the (uniform) shard column followed by an
    in-partition sort; every shard is statistically the same size, so
    there is no skew to salt away. Position-in-shard, when a consumer
    needs it, is the rank of shuffle_key inside that shard's file —
    implicit in the sort order, never materialized as a window."""
    k = F.md5(
        F.concat_ws(":", F.lit(salt), F.col(key_col).cast("string"))
    )
    return docs.withColumn("shuffle_key", k).withColumn(
        "shard", F.substring(k, 1, prefix_len)
    )


def shuffle_shard_stats(docs, key_col: str = "doc_id", text_col: str = "text",
                        prefix_len: int = 1, salt: str = "shuffle-v1"):
    """Per-shard audit of the deterministic shuffle: (shard, n_docs,
    n_tokens, first_key, last_key). The key/extremes make the shard
    CONTENT order-checkable, not just its size."""
    from incubator_hugegraph_computer_spark.functions.text import token_count

    sh = shuffle_shards(docs, key_col=key_col, prefix_len=prefix_len, salt=salt)
    return sh.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col(text_col))).alias("n_tokens"),
        F.min("shuffle_key").alias("first_key"),
        F.max("shuffle_key").alias("last_key"),
    )
