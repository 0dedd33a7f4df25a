"""Deduplication operators for large text corpora.

Four families, each shaped for the 100 TB case:

- **exact**: hash-groupBy on a content digest — one shuffle, the
  canonical first pass.
- **n-gram Jaccard**: word-shingle inverted index → candidate pairs
  that share a shingle → exact Jaccard verify. The candidate join is
  the scale risk (hot shingles ⇒ quadratic buckets), so ultra-frequent
  shingles are dropped (`max_shingle_freq`) — standard practice: a
  shingle shared by thousands of docs carries no dedup signal.
- **MinHash + LSH**: fixed-size signature (min over seeded hashes per
  shingle), banded into buckets; only same-bucket pairs are compared.
  Hashing uses md5 (available in every engine) so oracles can replay it.
- **SimHash**: 32-bit sign-aggregated fingerprint; near-dups differ in
  few bits. All arithmetic via JVM expressions (conv/md5), no Python.

All functions return DataFrames; nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from incubator_hugegraph_computer_spark.functions.text import _tokens


# ------------------------------------------------------------------ exact
def exact_duplicates(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, canonical_id, group_size) for docs whose exact content
    (md5) appears more than once; canonical = min doc_id of the group."""
    hashed = documents.select("doc_id", F.md5(F.col(text_col)).alias("h"))
    groups = hashed.groupBy("h").agg(
        F.min("doc_id").alias("canonical_id"), F.count(F.lit(1)).alias("group_size")
    )
    return (
        hashed.join(groups, "h")
        .where(F.col("group_size") > 1)
        .select("doc_id", "canonical_id", "group_size")
    )


# --------------------------------------------------------------- shingles
def shingles(documents: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) distinct word n-grams (lowercased, punctuation
    split). Pure native expressions — deliberately NO higher-order
    functions: a ``transform(sequence(...), λ)`` formulation evaluates
    its lambda interpreted per array element (outside whole-stage
    codegen) and measured ~6x slower on this hot path. Instead the
    n-gram windows come from ``arrays_zip`` of n shifted ``slice``s of
    the token array; the token array itself is materialized as its own
    projection so the regex tokenization runs once per document."""
    toks = F.col("__toks")
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(toks, i + 1, m).alias(f"t{i}") for i in range(n)])
    return (
        documents.select("doc_id", _tokens(F.col(text_col)).alias("__toks"))
        .select("doc_id", F.explode(zipped).alias("s"))
        .select(
            "doc_id",
            F.concat_ws(" ", *[F.col(f"s.t{i}") for i in range(n)]).alias("shingle"),
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.7,
    text_col: str = "text",
    max_shingle_freq: int = 1000,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for candidate pairs with Jaccard ≥
    threshold over word n-gram shingle sets (doc_a < doc_b).

    Jaccard is computed entirely over the FREQUENCY-FILTERED shingle
    space: intersection AND set sizes both exclude shingles with df >
    ``max_shingle_freq``. Mixing spaces (filtered intersection over
    unfiltered sizes) would bias every score downward — two identical
    docs sharing saturated shingles would score below 1.0 and could miss
    the threshold."""
    sh = shingles(documents, n, text_col).persist()
    # drop saturated shingles — no signal, quadratic blowup at scale
    freq_ok = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= max_shingle_freq)
        .select("shingle")
    )
    sh_f = sh.join(freq_ok, "shingle", "left_semi")
    sizes = sh_f.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh_f.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh_f.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("size_b"))
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        # materialize (the pair set is small), then release the shingle
        # cache — otherwise every call leaks it for the session lifetime
        .localCheckpoint(eager=True)
    )
    sh.unpersist()
    return out


# ---------------------------------------------------------------- minhash
def minhash_signatures(
    documents: DataFrame,
    num_hashes: int = 16,
    n: int = 3,
    text_col: str = "text",
    shingle_table: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, seed, minhash) — minhash[seed] = min over shingles of
    md5(seed || '|' || shingle). md5-as-hash-family keeps the signature
    reproducible in any engine; the min is a plain groupBy agg (partial
    map-side min → tiny shuffle). Pass ``shingle_table`` (a
    :func:`shingles` result, e.g. persisted) to reuse an already-built
    shingle set instead of re-tokenizing."""
    sh = shingles(documents, n, text_col) if shingle_table is None else shingle_table
    # One projection computes all hash-family values per shingle, one
    # groupBy computes all mins: no num_hashes-fold row blowup, single
    # shuffle of |docs| rows (vs |shingles|·num_hashes with a seed
    # cross-join).
    hashed = sh.select(
        "doc_id",
        *[
            F.md5(F.concat_ws("|", F.lit(s), F.col("shingle"))).alias(f"h{s}")
            for s in range(num_hashes)
        ],
    )
    sig = hashed.groupBy("doc_id").agg(
        *[F.min(f"h{s}").alias(f"h{s}") for s in range(num_hashes)]
    )
    # unpivot back to the (doc_id, seed, minhash) long form the LSH
    # banding consumes
    pairs = F.array(
        *[
            F.struct(F.lit(s).alias("seed"), F.col(f"h{s}").alias("minhash"))
            for s in range(num_hashes)
        ]
    )
    return sig.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", F.col("p.seed").alias("seed"), F.col("p.minhash").alias("minhash")
    )


def minhash_candidates(
    documents: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    shingle_table: DataFrame | None = None,
) -> DataFrame:
    """LSH-banded MinHash near-dup detection:
    signature → ``bands`` bands of ``num_hashes/bands`` rows → docs
    sharing any band bucket become candidates → exact Jaccard verify.
    Returns (doc_a, doc_b, jaccard) with jaccard ≥ threshold, doc_a <
    doc_b. ``shingle_table`` (a precomputed :func:`shingles` result for
    ``documents``) skips the tokenize+shingle pass — callers that
    already hold one (the streaming near-dup path) MUST thread it
    through; its lifecycle stays with the caller."""
    # ONE shingle pass feeds both the signature build and the exact
    # verify — tokenization + the shingle explode dominate this path,
    # so computing them twice would double the corpus scan work
    caller_owned = shingle_table is not None
    sh = shingle_table if caller_owned else shingles(documents, n, text_col).persist()
    band_key = lsh_band_buckets(
        documents, num_hashes, bands, n, text_col, shingle_table=sh
    )
    a = band_key.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    b = band_key.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    cand = (
        a.join(b, ["band", "bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # exact verify on candidates only
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    ja = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    jb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(ja, "doc_a")
        .join(jb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("size_b"))
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        # verified pair set is small: materialize it, release the
        # shingle cache (streaming callers invoke this per micro-batch —
        # an unreleased persist per call would grow until OOM)
        .localCheckpoint(eager=True)
    )
    if not caller_owned:
        sh.unpersist()
    return out


# ---------------------------------------------------------------- simhash
def simhash_signatures(
    documents: DataFrame, bits: int = 32, text_col: str = "text"
) -> DataFrame:
    """(doc_id, simhash) — 32-bit SimHash over the token multiset.

    Each distinct token hashes to 32 bits (first 8 hex chars of md5,
    decoded JVM-side via conv()); bit j contributes +count/−count to an
    accumulator; the sign pattern is the fingerprint. Everything is
    expression-level: explode → conv → bit tests via shiftright/&1 →
    groupBy sum."""
    toks = documents.select(
        "doc_id", F.explode(_tokens(F.col(text_col))).alias("tok")
    ).groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
    with_bits = toks.select("doc_id", "cnt", h.alias("h"))
    bit_cols = [
        (
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, F.col("cnt"))
            .otherwise(-F.col("cnt"))
        ).alias(f"b{j}")
        for j in range(bits)
    ]
    summed = with_bits.select("doc_id", *bit_cols).groupBy("doc_id").agg(
        *[F.sum(f"b{j}").alias(f"b{j}") for j in range(bits)]
    )
    sig = None
    for j in range(bits):
        term = F.when(F.col(f"b{j}") > 0, F.lit(2**j)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return summed.select("doc_id", sig.cast("long").alias("simhash"))


def simhash_near_duplicates(
    documents: DataFrame, max_hamming: int = 3, text_col: str = "text"
) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs with Hamming(simhash) ≤ max_hamming.

    Candidate generation by banding the 32 bits into 4 bytes (pigeonhole:
    ≤3 differing bits ⇒ at least one identical byte), then exact popcount
    verify — avoids the all-pairs cross join at scale. The 4-byte
    banding only guarantees recall for max_hamming ≤ 3 — a pair with 4+
    differing bits spread across all four bytes shares no bucket — so
    larger values are refused rather than silently under-reported."""
    if not 0 <= max_hamming <= 3:
        raise ValueError(
            f"max_hamming must be in [0, 3] (4-band pigeonhole bound), got {max_hamming}"
        )
    sig = simhash_signatures(documents, 32, text_col).persist()
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        F.lit(i),
                        F.shiftright(F.col("simhash"), 8 * i).bitwiseAND(F.lit(0xFF)),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bucket"),
    )
    a = bands.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"), "bucket")
    b = bands.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"), "bucket")
    cand = (
        a.join(b, "bucket")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .distinct()
    )
    xor = F.col("sig_a").bitwiseXOR(F.col("sig_b"))
    ham = None
    for j in range(32):
        bit = F.shiftright(xor, j).bitwiseAND(F.lit(1))
        ham = bit if ham is None else ham + bit
    out = (
        cand.select("doc_a", "doc_b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .localCheckpoint(eager=True)  # small; lets the signature cache go
    )
    sig.unpersist()
    return out


def dedup_clusters(
    documents: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, canonical_id) — near-duplicate CLUSTERS, not just pairs:
    the MinHash-LSH pair set becomes an undirected graph and the BSP WCC
    engine assigns every document to the component of its transitive
    near-dup closure; canonical_id = min doc_id of the cluster
    (singletons map to themselves).

    This is the full training-data dedup pass — pair detection alone
    under-removes because near-duplication is transitive in practice
    (A≈B, B≈C ⇒ keep one of {A,B,C}) — and it is the integration point
    between the pipeline operators and the graph engine: the pair table
    IS an edge table.
    """
    from incubator_hugegraph_computer_spark.graph import Graph
    from incubator_hugegraph_computer_spark.operators.wcc import wcc

    # minhash_candidates/shingles key on 'doc_id'; normalize a custom
    # id_col at the boundary so edges and vertices share one id space
    if id_col != "doc_id":
        documents = documents.withColumnRenamed(id_col, "doc_id")
        id_col = "doc_id"
    pairs = minhash_candidates(documents, num_hashes, bands, n, threshold, text_col)
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    verts = documents.select(F.col(id_col).alias("id"))
    # Near-dup candidate graphs are transitively chain-shaped (a~b~c~…
    # through sliding boilerplate), so component diameter grows with
    # corpus size; the large-star/small-star contraction stays O(log n)
    # rounds and cannot silently truncate at a superstep cap the way
    # min-propagation can.
    comp = wcc(Graph(verts, edges), method="contract")
    return comp.select(F.col("id").alias("doc_id"), F.col("comp").alias("canonical_id"))


# ------------------------------------------------------- span-level dedup
def span_positions(documents: DataFrame, n: int = 5, text_col: str = "text") -> DataFrame:
    """(doc_id, span) — one row per token n-gram POSITION (duplicates
    kept, unlike :func:`shingles`): a span repeated inside one document
    counts once per occurrence, which is what span-level dup fractions
    need. Same HOF-free arrays_zip build as :func:`shingles`."""
    toks = F.col("__toks")
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(toks, i + 1, m).alias(f"t{i}") for i in range(n)])
    return (
        documents.select("doc_id", _tokens(F.col(text_col)).alias("__toks"))
        .select("doc_id", F.explode(zipped).alias("s"))
        .select(
            "doc_id",
            F.concat_ws(" ", *[F.col(f"s.t{i}") for i in range(n)]).alias("span"),
        )
    )


def span_dedup_stats(documents: DataFrame, n: int = 5, text_col: str = "text") -> DataFrame:
    """(doc_id, n_spans, dup_span_frac) — Gopher/RefinedWeb-style
    cross-document span duplication: the fraction of a document's token
    n-gram positions whose span text also occurs in at least one OTHER
    document. Pipelines drop or down-weight documents above a
    dup_span_frac threshold (RefinedWeb removes matching 13-gram spans;
    n is a parameter here, small-doc test data uses n=5).

    Scale shape: one explode (E = token positions ≈ corpus tokens), one
    distinct + groupBy to find cross-document spans (map-side partial
    aggregation), one semi join back. No pairwise comparisons anywhere —
    cost is linear in corpus tokens, the same shape as the shingle
    inverted index in :func:`ngram_jaccard_pairs`.
    """
    sp = span_positions(documents, n, text_col).persist()
    # spans seen in >= 2 distinct documents
    shared = (
        sp.distinct()
        .groupBy("span")
        .agg(F.count(F.lit(1)).alias("ndocs"))
        .where(F.col("ndocs") >= 2)
        .select("span")
    )
    totals = sp.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_spans"))
    dups = (
        sp.join(shared, "span", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("dup_spans"))
    )
    out = (
        documents.select("doc_id")
        .join(totals, "doc_id", "left")
        .join(dups, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_spans"), F.lit(0)).alias("n_spans"),
            F.round(
                F.coalesce(
                    F.col("dup_spans").cast("double") / F.col("n_spans").cast("double"),
                    F.lit(0.0),
                ),
                6,
            ).alias("dup_span_frac"),
        )
        # one row per doc: materialize, release the span-position cache
        .localCheckpoint(eager=True)
    )
    sp.unpersist()
    return out


# --------------------------------------------------------- decontamination
def decontaminate(
    documents: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: for every training document, the
    fraction of its distinct word n-gram shingles that also appear in
    ANY evaluation document — the standard n-gram-overlap contamination
    check run before training on web-scale corpora (flag/drop training
    docs that quote held-out benchmarks).

    Returns (doc_id, n_shingles, n_contaminated, contaminated_frac),
    one row per training doc; docs too short to have a shingle get
    (0, 0, 0.0).

    100 TB shape: the eval side is small by construction (benchmarks,
    not corpora), so its distinct shingle set is broadcast and the only
    shuffle over training data is the per-doc groupBy — the training
    corpus is scanned once, never self-joined. The shingle extraction
    reuses the HOF-free :func:`shingles` path (whole-stage codegen).
    """
    train_sh = shingles(documents, n=n, text_col=text_col)
    eval_sh = (
        shingles(eval_docs, n=n, text_col=text_col).select("shingle").distinct()
    )
    sizes = train_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        train_sh.join(F.broadcast(eval_sh), "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return (
        documents.select("doc_id")
        .join(sizes, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_shingles"), F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("long").alias("n_contaminated"),
            F.coalesce(
                F.col("n_contaminated").cast("double")
                / F.col("n_shingles").cast("double"),
                F.lit(0.0),
            ).alias("contaminated_frac"),
        )
    )


def lsh_band_buckets(
    documents: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    text_col: str = "text",
    shingle_table: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, band, bucket) — the banded-minhash LSH key table. This
    IS the persistable dedup index: compute it once per corpus version
    (or append per ingested shard) and every later delta joins it
    instead of re-hashing the corpus.

    ``bands`` must divide ``num_hashes`` — a remainder would silently
    create an extra short band (different LSH probability curve), and
    bands > num_hashes would divide by zero into one NULL band whose
    bucket is the whole signature (exact match only)."""
    if bands < 1 or num_hashes % bands != 0:
        raise ValueError(
            f"bands ({bands}) must be a positive divisor of num_hashes ({num_hashes})"
        )
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(documents, num_hashes, n, text_col, shingle_table)
    return (
        sig.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.concat_ws(",", F.sort_array(F.collect_list("minhash")))
            ).alias("bucket")
        )
    )


def incremental_minhash_dedup(
    new_docs: DataFrame,
    corpus: DataFrame | None,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    corpus_index: DataFrame | None = None,
    corpus_shingles: DataFrame | None = None,
    new_shingles: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, dup_of, jaccard, keep) — dedup a NEW shard against an
    EXISTING corpus. At 100 TB nobody re-deduplicates the whole corpus
    when a crawl lands; the index side (corpus band buckets) is computed
    once and each delta joins against it: candidates = new docs sharing
    any LSH band bucket with a corpus doc, then exact-Jaccard verify on
    candidates only. Every new doc is returned: ``dup_of`` = the
    best-matching corpus doc (highest jaccard ≥ threshold, ties to the
    lowest corpus id), ``keep`` = 1 iff no corpus match.

    Pass ``corpus_index`` (a persisted :func:`lsh_band_buckets` table,
    columns (doc_id|corpus_id, band, bucket)) and ``corpus_shingles``
    (a persisted :func:`shingles` table) to skip re-hashing the corpus —
    the repeated-delta path MUST do this or each call re-tokenizes and
    re-minhashes the whole corpus (O(deltas × corpus) compute).
    ``corpus`` may then be None. ``new_shingles`` (a precomputed
    :func:`shingles` table for ``new_docs``) likewise skips re-shingling
    the delta when the caller already holds one.

    Unlike :func:`minhash_candidates`, candidates here are new×corpus
    only — new×new pairs are deliberately NOT considered (dedup within
    the shard is a separate, composable pass).
    """
    if corpus_index is None:
        corpus_index = lsh_band_buckets(corpus, num_hashes, bands, n, text_col)
    if "corpus_id" not in corpus_index.columns:
        corpus_index = corpus_index.withColumnRenamed("doc_id", "corpus_id")
    cand = (
        lsh_band_buckets(
            new_docs, num_hashes, bands, n, text_col, shingle_table=new_shingles
        )
        .join(corpus_index, ["band", "bucket"])
        .select("doc_id", "corpus_id")
        .distinct()
    )
    sh_new = new_shingles if new_shingles is not None else shingles(new_docs, n, text_col)
    sh_corp = (
        shingles(corpus, n, text_col)
        if corpus_shingles is None
        else corpus_shingles.withColumnRenamed("corpus_id", "doc_id")
    )
    sz_new = sh_new.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_new"))
    sz_corp = sh_corp.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_corp"))
    inter = (
        cand.join(sh_new, "doc_id")
        .join(
            sh_corp.select(F.col("doc_id").alias("corpus_id"), "shingle"),
            ["corpus_id", "shingle"],
        )
        .groupBy("doc_id", "corpus_id")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    j = (
        inter.join(sz_new, "doc_id")
        .join(sz_corp.withColumnRenamed("doc_id", "corpus_id"), "corpus_id")
        .select(
            "doc_id",
            "corpus_id",
            (
                F.col("inter").cast("double")
                / (F.col("n_new") + F.col("n_corp") - F.col("inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    # best match per new doc: max jaccard, ties → lowest corpus id
    best = j.groupBy("doc_id").agg(
        F.max(
            F.struct(F.col("jaccard"), (-F.col("corpus_id")).alias("nid"))
        ).alias("b")
    )
    return (
        new_docs.select("doc_id")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            (-F.col("b.nid")).cast("long").alias("dup_of"),
            F.round("b.jaccard", 6).alias("jaccard"),
            F.when(F.col("b").isNull(), 1).otherwise(0).cast("int").alias("keep"),
        )
    )


def lsh_recall_report(
    documents: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    truth_threshold: float = 0.2,
    max_shingle_freq: int = 1000,
    text_col: str = "text",
) -> DataFrame:
    """One row (n_true, n_candidates, n_hits, recall) — measured recall
    of the banded-MinHash candidate generator against the exact n-gram
    Jaccard truth set (pairs with Jaccard ≥ ``truth_threshold`` under
    :func:`ngram_jaccard_pairs` semantics, hot-shingle cap included).

    This is the "measure, don't guess" companion to the dedup ladder:
    (num_hashes, bands) set the LSH S-curve, and this report tells you
    what the index actually catches on YOUR corpus before you commit a
    100 TB pass to it. n_candidates / n_true is the verify-stage cost
    multiplier; recall is the miss rate's complement at the truth
    threshold.

    Scale shape: the truth side is the bucketed shingle self-join
    (bounded by the hot-shingle cap), the candidate side is the banded
    LSH self-join, the comparison is one semi-join of two pair sets,
    and the three counts cross as one-row broadcast frames.
    """
    truth = ngram_jaccard_pairs(
        documents, n=n, threshold=truth_threshold,
        max_shingle_freq=max_shingle_freq, text_col=text_col,
    ).select("doc_a", "doc_b")
    band_key = lsh_band_buckets(documents, num_hashes, bands, n, text_col)
    a = band_key.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    b = band_key.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    cand = (
        a.join(b, ["band", "bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .localCheckpoint(eager=True)  # reused by two consumers below
    )
    hits = truth.join(cand, ["doc_a", "doc_b"], "left_semi")
    nt = truth.agg(F.count(F.lit(1)).alias("n_true"))
    nc = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    nh = hits.agg(F.count(F.lit(1)).alias("n_hits"))
    return (
        nt.crossJoin(nc)
        .crossJoin(nh)
        .select(
            "n_true",
            "n_candidates",
            "n_hits",
            F.round(
                F.when(
                    F.col("n_true") > 0,
                    F.col("n_hits").cast("double") / F.col("n_true").cast("double"),
                ),
                6,
            ).alias("recall"),
        )
    )


def containment_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.6,
    text_col: str = "text",
    max_shingle_freq: int = 1000,
) -> DataFrame:
    """(doc_a, doc_b, containment) — ordered pairs where containment =
    |shingles(a) ∩ shingles(b)| / |shingles(a)| ≥ threshold, a ≠ b.

    The ASYMMETRIC companion to ``ngram_jaccard_pairs``: Jaccard misses
    sub-document inclusion (a paragraph quoted inside a much longer
    page scores near 0 Jaccard but containment ≈ 1 from the paragraph's
    side) — the standard filter for boilerplate inclusion and quote
    chains in web-scale corpora (Broder's containment, the other half
    of the resemblance/containment pair that MinHash was built for).

    Same frequency-filtered shingle space discipline as
    ``ngram_jaccard_pairs`` (both numerator and denominator exclude
    saturated shingles), same bucket-then-verify scale shape — the
    candidate join touches only co-shingled pairs.
    """
    sh = shingles(documents, n, text_col).persist()
    freq_ok = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= max_shingle_freq)
        .select("shingle")
    )
    sh_f = sh.join(freq_ok, "shingle", "left_semi")
    sizes = sh_f.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh_f.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh_f.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("size_a"))
    out = (
        inter.join(sa, "doc_a")
        .select(
            "doc_a",
            "doc_b",
            (F.col("inter").cast("double") / F.col("size_a")).alias("c"),
        )
        .where(F.col("c") >= threshold)
        .select("doc_a", "doc_b", F.round("c", 6).alias("containment"))
        .localCheckpoint(eager=True)  # then release the shingle cache
    )
    sh.unpersist()
    return out
