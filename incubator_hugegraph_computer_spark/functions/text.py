"""Text analysis for training-data pipelines — all JVM-side expressions.

These run over the ``documents`` table (doc_id, text, lang, source,
n_chars). Every function is pure ``pyspark.sql.functions`` — no Python
UDFs — so the whole stage stays inside whole-stage codegen and scales
linearly with input splits. Formulas are deliberately closed-form so a
SQL oracle can reproduce them bit-for-bit (floats rounded to 6dp at the
query boundary).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# Token = maximal run of alphanumerics (BPE-ish lower bound on tokens).
TOKEN_SPLIT_RE = "[^a-zA-Z0-9]+"

# Tiny per-language stopword markers for the n-gram language heuristic.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "et", "des"],
    "es": ["el", "los", "las", "que", "una"],
}

STOPWORDS_EN = ["the", "a", "and", "of", "to", "in", "is", "on", "for", "with"]


def _tokens(text: Column) -> Column:
    # array_remove, not filter(λ): higher-order-function lambdas are
    # interpreted per element (outside whole-stage codegen) and measure
    # ~5x slower on this hot path; array_remove is a native expression.
    return F.array_remove(F.split(F.lower(text), TOKEN_SPLIT_RE), "")


def token_count(text: Column) -> Column:
    """Whitespace/punctuation token count (long)."""
    return F.size(_tokens(text)).cast("long")


def _marker_hits(text: Column, words: list[str]) -> Column:
    """Total occurrences of any marker word, word-bounded."""
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(text), F.lit(pat))


def language_id(text: Column) -> Column:
    """Deterministic stopword-marker classifier → lang code or 'und'.

    Argmax over marker-hit counts with fixed priority order en>de>fr>es
    on ties; 'und' when no marker hits at all.
    """
    scores = [(lang, _marker_hits(text, words)) for lang, words in LANG_MARKERS.items()]
    best = None
    best_score = None
    # fold as nested CASE WHEN, honoring priority order on ties (>)
    for lang, score in scores:
        if best is None:
            best, best_score = F.lit(lang), score
        else:
            cond = score > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, score).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("und"))


def quality_score(text: Column, n_chars: Column) -> Column:
    """Heuristic [0,1] quality: length band + punctuation ratio +
    stopword ratio (the classic pre-filter trio for web corpora)."""
    toks = token_count(text)
    punct = F.regexp_count(text, F.lit(r"[^a-zA-Z0-9\s]")).cast("double")
    punct_ratio = punct / F.greatest(n_chars.cast("double"), F.lit(1.0))
    stop_hits = _marker_hits(text, STOPWORDS_EN).cast("double")
    stop_ratio = stop_hits / F.greatest(toks.cast("double"), F.lit(1.0))
    len_ok = (toks >= 10).cast("double") * 0.4
    punct_ok = (punct_ratio < 0.2).cast("double") * 0.3
    stop_ok = ((stop_ratio > 0.01) & (stop_ratio < 0.6)).cast("double") * 0.3
    return len_ok + punct_ok + stop_ok


def document_fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 over the normalized token stream
    (lowercase, punctuation-insensitive) — catches trivially reformatted
    duplicates where raw sha256 does not."""
    return F.md5(F.concat_ws(" ", _tokens(text)))


def repetition_stats(documents: DataFrame) -> DataFrame:
    """Gopher-style repetition signals per document — the classic
    "remove boilerplate/spam" pre-filters for web-scale corpora
    (Rae et al. 2021 §A1.1): duplicate-word fraction, most-frequent-word
    share, duplicate-bigram fraction.

    Output: (doc_id, n_tokens, dup_word_frac, top_word_share,
    dup_bigram_frac), fractions rounded 6dp.

    Physical shape: ONE projection computes the token array and the
    array-side distinct counts (no shuffle); the only shuffles are the
    two doc-keyed aggregations needed for the modal word count
    (explode → groupBy(doc_id, tok) with map-side combine → groupBy
    doc_id). The functionally-dependent per-doc scalars ride along as
    grouping keys, so there is no join back. Everything is keyed by
    doc_id — embarrassingly parallel at any corpus size.

    The bigram array uses ``zip_with`` (an interpreted higher-order
    function — see the ``_tokens`` note): acceptable here because it
    runs once per document inside the same projection, not per token.
    """
    l = _tokens(F.col("text"))
    base = documents.select(
        "doc_id",
        l.alias("l"),
        F.size(l).alias("n_tokens"),
        F.size(F.array_distinct(l)).alias("n_distinct"),
        F.greatest(F.size(l) - 1, F.lit(0)).alias("n_bigrams"),
        F.when(F.size(l) < 2, F.lit(0))
        .otherwise(
            F.size(
                F.array_distinct(
                    F.expr(
                        "zip_with(slice(l, 1, size(l)-1), slice(l, 2, size(l)-1),"
                        " (x, y) -> concat(x, '_', y))"
                    )
                )
            )
        )
        .alias("n_bi_dist"),
    )
    keys = ["doc_id", "n_tokens", "n_distinct", "n_bigrams", "n_bi_dist"]
    counted = (
        base.select(*keys, F.explode_outer("l").alias("tok"))
        .groupBy(*keys, "tok")
        .agg(F.count("*").alias("c"))
        .groupBy(*keys)
        .agg(
            F.max(F.when(F.col("tok").isNotNull(), F.col("c")).otherwise(0)).alias(
                "top_cnt"
            )
        )
    )
    nt = F.col("n_tokens").cast("double")
    nb = F.col("n_bigrams").cast("double")
    return counted.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(
            F.when(F.col("n_tokens") == 0, F.lit(0.0)).otherwise(
                F.lit(1.0) - F.col("n_distinct") / nt
            ),
            6,
        ).alias("dup_word_frac"),
        F.round(
            F.when(F.col("n_tokens") == 0, F.lit(0.0)).otherwise(F.col("top_cnt") / nt),
            6,
        ).alias("top_word_share"),
        F.round(
            F.when(F.col("n_bigrams") == 0, F.lit(0.0)).otherwise(
                F.lit(1.0) - F.col("n_bi_dist") / nb
            ),
            6,
        ).alias("dup_bigram_frac"),
    )


def diversity_stats(documents: DataFrame) -> DataFrame:
    """Lexical-diversity quality signals per document: type-token ratio
    and Shannon word entropy (nats) — the standard complements to the
    Gopher repetition filters (low-entropy docs = keyword stuffing /
    boilerplate; they can pass dup-word checks while still being junk).

    Output: (doc_id, n_tokens, ttr, word_entropy), rounded 6dp.

    Physical shape mirrors ``repetition_stats``: one projection builds
    the token array and its distinct size (no shuffle), then explode →
    groupBy(doc_id, tok) with map-side combine → groupBy(doc_id) folds
    Σ c·ln c, and entropy = ln n − Σ c·ln c / n needs no join back
    because the per-doc scalars ride as grouping keys. Keyed by doc_id
    throughout — embarrassingly parallel at corpus scale.
    """
    l = _tokens(F.col("text"))
    base = documents.select(
        "doc_id",
        l.alias("l"),
        F.size(l).alias("n_tokens"),
        F.size(F.array_distinct(l)).alias("n_distinct"),
    )
    keys = ["doc_id", "n_tokens", "n_distinct"]
    folded = (
        base.select(*keys, F.explode_outer("l").alias("tok"))
        .groupBy(*keys, "tok")
        .agg(F.count("*").alias("c"))
        .groupBy(*keys)
        .agg(
            F.sum(
                F.when(
                    F.col("tok").isNotNull(), F.col("c") * F.log(F.col("c"))
                ).otherwise(0.0)
            ).alias("_sclc")
        )
    )
    nt = F.col("n_tokens").cast("double")
    return folded.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(
            F.when(F.col("n_tokens") == 0, F.lit(0.0)).otherwise(
                F.col("n_distinct") / nt
            ),
            6,
        ).alias("ttr"),
        F.round(
            F.when(F.col("n_tokens") == 0, F.lit(0.0)).otherwise(
                F.log(nt) - F.col("_sclc") / nt
            ),
            6,
        ).alias("word_entropy"),
    )


def analyze(documents: DataFrame) -> DataFrame:
    """All text metrics in one pass."""
    return documents.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        language_id(F.col("text")).alias("lang_pred"),
        F.round(quality_score(F.col("text"), F.col("n_chars")), 6).alias("quality"),
        document_fingerprint(F.col("text")).alias("fingerprint"),
    )


def tfidf_keywords(
    documents: DataFrame, top_n: int = 3, text_col: str = "text"
) -> DataFrame:
    """(doc_id, rank, keyword, tf, score) — top-``top_n`` keywords per
    document by smoothed tf-idf: score = tf · (ln((N+1)/(df+1)) + 1)
    (sklearn's smooth_idf), ranked per document by (score desc, keyword
    asc). The standard corpus-curation signal for topic balancing /
    keyword-based filtering at training-data scale.

    Scale shape: one token explode, two hash aggregations (tf per
    (doc, token) with map-side partial agg; df per token), the corpus
    size N attached as a one-row broadcast (no driver round trip), and
    the per-document top-n via a window PARTITIONED by doc_id — bounded
    partitions (a document's distinct tokens), never a global sort.
    """
    toks = documents.select(
        "doc_id", F.explode(_tokens(F.col(text_col))).alias("keyword")
    )
    tf = toks.groupBy("doc_id", "keyword").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("keyword").agg(F.count(F.lit(1)).alias("df"))
    n_docs = documents.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(df_, "keyword")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * (
                F.log(
                    (F.col("__n").cast("double") + F.lit(1.0))
                    / (F.col("df").cast("double") + F.lit(1.0))
                )
                + F.lit(1.0)
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("keyword"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_n)
        .select("doc_id", "rank", "keyword", "tf", F.round("score", 6).alias("score"))
    )


def bm25_scores(
    documents: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_hits, score) — Okapi BM25 of one fixed query against
    every document, the standard quality/relevance ranking primitive for
    retrieval-filtered corpus curation (rank a 100 TB crawl against a
    topic query, keep the head).

      idf(t)      = ln(1 + (N − df + 0.5)/(df + 0.5))      (Lucene idf)
      tfNorm(t,d) = tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))
      score(d)    = Σ_{t∈query} idf(t) · tfNorm(t,d)

    Every document is returned (score 0.0 when no query term occurs),
    so downstream threshold filters see the full population.

    Scale shape: document lengths and the global (N, avgdl, per-term
    df) are two aggregations; df only needs the |query|-term subset, so
    the explode is filtered to query terms BEFORE the tf groupBy — the
    shuffle carries at most |query| rows per document. The global
    scalars attach as a one-row broadcast; no driver round trip, no
    window, no global sort.
    """
    import re as _re

    # normalize query terms exactly like _tokens normalizes documents
    # (lowercase, alphanumeric runs) — 'Apple' or "don't" would otherwise
    # silently match nothing and score every document 0.0
    terms = sorted(
        {t for q in query_terms for t in _re.split(r"[^a-z0-9]+", q.lower()) if t}
    )
    if not terms:
        raise ValueError(f"query_terms {query_terms!r} normalize to nothing")
    toks = documents.select(
        "doc_id", F.explode(_tokens(F.col(text_col))).alias("term")
    )
    lens = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    # every document participates, including empty-token ones (dl=0)
    lens = documents.select("doc_id").join(lens, "doc_id", "left").fillna(0, ["dl"])
    qtoks = toks.where(F.col("term").isin(terms))
    tf = qtoks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    glob = lens.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg("dl").alias("__avgdl"),
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_d = F.col("tf").cast("double")
    tfnorm = (
        tf_d
        * F.lit(k1 + 1.0)
        / (
            tf_d
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("__avgdl"))
        )
    )
    per_term = (
        tf.join(F.broadcast(df_), "term")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(glob))
        .select("doc_id", (idf * tfnorm).alias("s"))
    )
    scored = per_term.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_hits"), F.sum("s").alias("score")
    )
    return (
        documents.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            F.round(F.coalesce(F.col("score"), F.lit(0.0)), 6).alias("score"),
        )
    )


# PII patterns — kept to syntax with identical semantics in Java regex
# (Spark) and RE2 (DuckDB/Trino): explicit char classes, greedy
# quantifiers, no backrefs/lookaround.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP_RE = r"([0-9]{1,3}\.){3}[0-9]{1,3}"
PII_PHONE_RE = r"\+?[0-9][0-9 -]{6,}[0-9]"


def redact_pii(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_ips, n_phones, clean_text) — regex-based PII
    redaction, the mandatory scrub pass before any web corpus ships:
    emails → ``<EMAIL>``, IPv4s → ``<IP>``, phone-like digit runs →
    ``<PHONE>``. Counts are taken at each stage so a downstream audit
    can aggregate redaction volume per source/domain.

    Redaction order is fixed (email, ip, phone) — phone's digit-run
    pattern would otherwise eat dotted IPs and the digits of an address.

    Scale shape: pure per-row JVM expressions (regexp_count /
    regexp_replace inside whole-stage codegen) — no shuffle, no Python,
    composes for free in front of dedup/filtering at 100 TB.
    """
    t = F.col(text_col)
    n_emails = F.regexp_count(t, F.lit(PII_EMAIL_RE))
    c1 = F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>")
    n_ips = F.regexp_count(c1, F.lit(PII_IP_RE))
    c2 = F.regexp_replace(c1, PII_IP_RE, "<IP>")
    n_phones = F.regexp_count(c2, F.lit(PII_PHONE_RE))
    c3 = F.regexp_replace(c2, PII_PHONE_RE, "<PHONE>")
    return documents.select(
        "doc_id",
        n_emails.cast("long").alias("n_emails"),
        n_ips.cast("long").alias("n_ips"),
        n_phones.cast("long").alias("n_phones"),
        c3.alias("clean_text"),
    )


def unigram_logprob(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, avg_logprob) — per-document mean log
    probability under the corpus-trained unigram LM:

        p(term) = tf(term) / total_tokens
        avg_logprob(doc) = (1/|doc|) Σ_tok ln p(tok)

    The classic cheap perplexity proxy for training-data quality
    filtering (CCNet-style): gibberish / rare-token-heavy documents
    score far below the corpus mode. Empty documents get NULL.

    Scale shape: one token explode feeding (a) the vocab aggregate
    (term → tf, bounded by vocab size, map-side combined) and (b) the
    per-(doc, term) counts; the two meet in ONE shuffle hash join keyed
    by term; the corpus total rides in as a one-row broadcast. No
    windows, no Python.
    """
    toks = documents.select("doc_id", F.explode(_tokens(F.col(text_col))).alias("term"))
    dt = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("c"))
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("tf"))
    total = vocab.agg(F.sum("tf").alias("__total"))
    scored = (
        dt.join(vocab, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            (
                F.sum(
                    F.col("c").cast("double")
                    * F.log(F.col("tf").cast("double") / F.col("__total").cast("double"))
                )
                / F.sum("c").cast("double")
            ).alias("avg_logprob"),
        )
    )
    return documents.select("doc_id").join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        "avg_logprob",
    )


def bigram_logprob(
    documents: DataFrame, lam: float = 0.75, text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_bigrams, avg_logprob) — per-document mean log
    probability under a corpus-trained INTERPOLATED bigram LM:

        p(w2 | w1) = λ · c(w1,w2)/c(w1·)  +  (1−λ) · tf(w2)/total
        avg_logprob(doc) = (1/(|doc|−1)) Σ_adjacent ln p(w2|w1)

    One rung up the perplexity-proxy ladder from ``unigram_logprob``:
    the bigram term catches shuffled/templated word salad that unigram
    frequencies score as fluent; the unigram interpolation floor keeps
    every observed bigram finite without smoothing hyperparameters
    beyond λ (0.75 — dyadic, so per-pair probabilities are computed
    bit-identically by any engine). Documents with <2 tokens get NULL.

    Scale shape: bigrams are built INSIDE the row with array ops (no
    positional self-join, no window); corpus model = two map-side-
    combined aggregates (bigram counts, bounded by distinct bigrams;
    context counts derived from them); scoring joins the per-(doc,
    bigram) counts to the model on the bigram key — one shuffle class —
    with the corpus total riding in as a one-row broadcast.
    """
    arr = documents.select("doc_id", _tokens(F.col(text_col)).alias("l"))
    # sequence(1, n) DESCENDS when n < 1 — the CASE guards short docs
    big = arr.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(l) < 2 THEN array() "
                "ELSE transform(sequence(1, size(l)-1), "
                "i -> struct(l[i-1] AS w1, l[i] AS w2)) END"
            )
        ).alias("bg"),
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    dbg = big.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    cb = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    cw = cb.groupBy("w1").agg(F.sum("cb").alias("cw"))
    toks = documents.select("doc_id", F.explode(_tokens(F.col(text_col))).alias("term"))
    uni = toks.groupBy("term").agg(F.count(F.lit(1)).alias("tf"))
    total = uni.agg(F.sum("tf").cast("double").alias("__total"))
    p = F.lit(lam) * F.col("cb").cast("double") / F.col("cw").cast("double") + F.lit(
        1.0 - lam
    ) * F.col("tf").cast("double") / F.col("__total")
    scored = (
        dbg.join(cb, ["w1", "w2"])
        .join(cw, "w1")
        .join(uni.select(F.col("term").alias("w2"), "tf"), "w2")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bigrams"),
            (F.sum(F.col("c").cast("double") * F.log(p)) / F.sum("c").cast("double")).alias(
                "avg_logprob"
            ),
        )
    )
    return documents.select("doc_id").join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0).cast("long")).alias("n_bigrams"),
        "avg_logprob",
    )


def top_terms(documents: DataFrame, k: int = 20, text_col: str = "text") -> DataFrame:
    """(term, tf, df) — the k globally heaviest terms by total
    occurrences (tf), with document frequency alongside. The corpus
    heavy-hitters report every training-data run starts from: boilerplate
    and spam campaigns surface as terms whose tf/df ratio explodes.

    Scale shape: explode → ONE hash aggregation keyed by term whose
    map-side partial agg bounds shuffle volume by distinct terms per
    partition (not token count); df via count_distinct(doc_id) rides the
    same aggregate. Top-k is orderBy+limit (TakeOrdered-style, fully
    parallel — no single-partition window), deterministic under the
    total order (tf DESC, term ASC).
    """
    toks = documents.select("doc_id", F.explode(_tokens(F.col(text_col))).alias("term"))
    return (
        toks.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.count_distinct("doc_id").alias("df"),
        )
        .orderBy(F.desc("tf"), "term")
        .limit(k)
    )


def winnow_fingerprints(
    documents: DataFrame, k: int = 4, window: int = 4, text_col: str = "text"
) -> DataFrame:
    """MOSS winnowing fingerprints: (doc_id, pos, fp).

    The guarantee-bearing document fingerprint (Schleimer, Wilkerson &
    Aiken, SIGMOD'03): hash every k-gram of the normalized token stream,
    slide a window of ``window`` consecutive k-gram hashes, and in each
    window select the minimum hash (ties → rightmost position); the
    deduplicated (pos, hash) picks are the fingerprint set. Any shared
    token run of length >= k + window - 1 between two documents is
    GUARANTEED to share a fingerprint — the substring-level
    contamination/clone detector that whole-doc ``document_fingerprint``
    and bag-of-shingles MinHash both miss.

    Hashes are the md5-prefix integers used across ``functions/dedup``
    (portable: DuckDB replays them bit-for-bit). ``pos`` is the 1-based
    token position where the selected k-gram starts.

    Physical shape — everything is keyed by doc_id, so every stage is
    embarrassingly parallel across documents: one projection builds
    tokens, a per-doc window (lead) forms k-grams, and window selection
    explodes each k-gram to the <= ``window`` window-starts it belongs
    to (fan-out exactly ×window — no self-join, no quadratic blowup on
    long documents) followed by a map-side-combined struct-min
    aggregate. No global shuffle keys, no driver collection; at 100 TB
    the stage scales with input splits.
    """
    from pyspark.sql import Window

    tp = documents.select(
        "doc_id", F.posexplode(_tokens(F.col(text_col))).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    w = Window.partitionBy("doc_id").orderBy("pos")
    kgram = F.concat_ws(" ", *[F.lead("tok", j).over(w) for j in range(k)])
    kg = (
        tp.select(
            "doc_id",
            "pos",
            kgram.alias("kgram"),
            F.lead("tok", k - 1).over(w).alias("_last"),
        )
        .where(F.col("_last").isNotNull())
        .select(
            "doc_id",
            "pos",
            F.conv(F.substring(F.md5("kgram"), 1, 8), 16, 10)
            .cast("long")
            .alias("h"),
        )
    )
    member = kg.select(
        "doc_id",
        "pos",
        "h",
        F.explode(
            F.sequence(F.col("pos") - window + 1, F.col("pos"))
        ).alias("s"),
    ).where(F.col("s") >= 1)
    picked = (
        member.groupBy("doc_id", "s")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.min(F.struct(F.col("h"), (-F.col("pos")).alias("_np"))).alias("_m"),
        )
        .where(F.col("_n") == window)  # full windows only
        .select("doc_id", (-F.col("_m._np")).cast("long").alias("pos"), F.col("_m.h").alias("fp"))
        .distinct()
    )
    return picked


def pmi_cooccurrence(
    documents: DataFrame, min_pair: int = 5, text_col: str = "text"
) -> DataFrame:
    """Pointwise-mutual-information token co-occurrence graph —
    (tok_a, tok_b, n_pair, pmi), one row per unordered token pair that
    co-occurs (document-level presence) in >= ``min_pair`` documents.

    pmi = ln(P(a,b) / (P(a)·P(b))) = ln(n_pair·N / (df_a·df_b)) over
    document frequencies — the classic collocation / topic-graph edge
    weight; the output IS an edge table, feeding the graph operators
    (e.g. louvain over PMI edges = topic clustering).

    Physical shape: explode per-doc DISTINCT tokens (bounded by doc
    length), self-join within doc_id for pairs (quadratic in per-doc
    vocab, linear in corpus), map-side-combined counts, broadcast of
    the one-row N. ``min_pair`` prunes the long tail BEFORE the df
    join. At 100 TB add a df floor on single tokens first — same
    pattern as tfidf's vocabulary pruning.
    """
    toks = documents.select(
        "doc_id", F.explode(F.array_distinct(_tokens(F.col(text_col)))).alias("tok")
    ).localCheckpoint(eager=True)
    n_docs = documents.agg(F.count(F.lit(1)).cast("long").alias("n"))
    df = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
    pairs = (
        toks.alias("a")
        .join(toks.alias("b"), "doc_id")
        .where(F.col("a.tok") < F.col("b.tok"))
        .groupBy(
            F.col("a.tok").alias("tok_a"), F.col("b.tok").alias("tok_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
        .where(F.col("n_pair") >= min_pair)
    )
    return (
        pairs.join(df.select(F.col("tok").alias("tok_a"), F.col("df").alias("df_a")), "tok_a")
        .join(df.select(F.col("tok").alias("tok_b"), F.col("df").alias("df_b")), "tok_b")
        .crossJoin(F.broadcast(n_docs))  # one-row scalar
        .select(
            "tok_a",
            "tok_b",
            "n_pair",
            F.round(
                F.log(
                    F.col("n_pair")
                    * F.col("n")
                    / (F.col("df_a") * F.col("df_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )


def cdc_chunks(
    documents: DataFrame, window: int = 8, text_col: str = "text"
) -> DataFrame:
    """(doc_id, chunk_id, chunk_len, chunk_md5) — content-defined
    chunking: a chunk boundary opens at every position p ≥ 2 whose
    ``window``-char substring hashes with a leading md5 nibble of '0'
    (expected chunk length ≈ 16 chars; the FastCDC/rsync principle
    with a portable hash so the oracle replays every boundary).

    Content-defined beats fixed-width chunking for dedup because an
    insertion only reshapes the ONE chunk it lands in — downstream,
    grouping by chunk_md5 across documents finds shared spans whatever
    their offset (the byte-level companion to ``span_dedup``'s
    token-level positional shingles).

    Physical shape: one position explode (rows = total chars), one
    per-document window cumulative sum (PARTITIONED by doc_id — never
    a global window), one groupBy per chunk + a substring/md5
    projection. Everything is per-document local, so 100 TB shards
    embarrassingly by doc.
    """
    n = F.length(F.col(text_col))
    pos = documents.select(
        "doc_id",
        F.col(text_col).alias("__t"),
        F.explode(F.sequence(F.lit(1), n)).alias("p"),
    )
    is_b = (
        (F.col("p") >= 2)
        & (F.col("p") <= F.length("__t") - (window - 1))
        & (F.substring(F.md5(F.expr(f"substring(__t, p, {window})")), 1, 1) == "0")
    ).cast("long")
    w = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = pos.select(
        "doc_id", "__t", "p", F.sum(is_b).over(w).alias("chunk_id")
    )
    return (
        tagged.groupBy("doc_id", "chunk_id")
        .agg(
            F.min("p").alias("__s"),
            F.max("p").alias("__e"),
            F.first("__t").alias("__t"),
        )
        .select(
            "doc_id",
            "chunk_id",
            (F.col("__e") - F.col("__s") + 1).cast("long").alias("chunk_len"),
            F.md5(F.expr("substring(__t, __s, __e - __s + 1)")).alias("chunk_md5"),
        )
    )


def zipf_alpha(
    documents: DataFrame, fmin: int = 2, text_col: str = "text"
) -> DataFrame:
    """One row (fmin, n_tail, alpha) — Hill/MLE estimate of the Zipf
    exponent of the corpus term-frequency distribution (the same
    Clauset-Shalizi-Newman estimator ``powerlaw_alpha`` applies to
    degrees, applied to vocabulary): alpha = 1 + n/Σ ln(f/(fmin−0.5))
    over terms with frequency ≥ fmin. A healthy natural-language
    corpus sits near alpha ≈ 2; synthetic/template-heavy corpora
    deviate — a cheap corpus-quality fingerprint."""
    tf = (
        documents.select(F.explode(_tokens(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("f"))
        .where(F.col("f") >= fmin)
    )
    return tf.agg(
        F.lit(fmin).cast("long").alias("fmin"),
        F.count(F.lit(1)).cast("long").alias("n_tail"),
        F.round(
            F.lit(1.0)
            + F.count(F.lit(1)) / F.sum(F.log(F.col("f") / F.lit(fmin - 0.5))),
            6,
        ).alias("alpha"),
    )
