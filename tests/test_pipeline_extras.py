"""Unit tests for the round-2 pipeline extensions: tf-idf keywords,
span-level dedup stats, and k-means embedding clustering — hand-built
inputs with closed-form expected answers (NumPy cross-check for
k-means)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from incubator_hugegraph_computer_spark.functions.dedup import (
    span_dedup_stats,
    span_positions,
)
from incubator_hugegraph_computer_spark.functions.similarity import kmeans_assign
from incubator_hugegraph_computer_spark.functions.text import tfidf_keywords


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta epsilon zeta"),  # exact dup of 0
        (2, "alpha beta gamma delta nothing else here at all"),  # shares one 5-gram pos
        (3, "totally unrelated words with no overlap whatsoever"),
        (4, "tiny"),  # shorter than the span width
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").persist()


# ------------------------------------------------------------------ spans
def test_span_positions_counts(spark, docs):
    sp = span_positions(docs, n=5)
    got = {r["doc_id"]: r["c"] for r in sp.groupBy("doc_id").agg(F.count(F.lit(1)).alias("c")).collect()}
    # 6 tokens -> 2 positions of width 5; 9 tokens -> 5; 7 tokens -> 3; 1 token -> none
    assert got == {0: 2, 1: 2, 2: 5, 3: 3}


def test_span_dedup_stats(spark, docs):
    out = {r["doc_id"]: r for r in span_dedup_stats(docs, n=5).collect()}
    assert set(out) == {0, 1, 2, 3, 4}
    # docs 0 and 1 are exact dups: every span position is cross-document
    assert out[0]["n_spans"] == 2 and out[0]["dup_span_frac"] == 1.0
    assert out[1]["dup_span_frac"] == 1.0
    # doc 2 shares exactly its first span 'alpha beta gamma delta nothing'?
    # no — its first 5-gram is 'alpha beta gamma delta nothing', which
    # matches nothing; no span of doc 2 appears elsewhere.
    assert out[2]["n_spans"] == 5 and out[2]["dup_span_frac"] == 0.0
    assert out[3]["dup_span_frac"] == 0.0
    # doc 4 has zero spans -> frac 0.0, not null
    assert out[4]["n_spans"] == 0 and out[4]["dup_span_frac"] == 0.0


# ------------------------------------------------------------------ tfidf
def test_tfidf_keywords(spark):
    rows = [
        (0, "spark spark spark unique common"),
        (1, "common words only common"),
        (2, "unique appears here common"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfidf_keywords(docs, top_n=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # every doc gets at most top_n rows, ranks are 1..n
    for doc_id, rs in by_doc.items():
        assert [r["rank"] for r in sorted(rs, key=lambda r: r["rank"])] == list(
            range(1, len(rs) + 1)
        )
    # doc 0: 'spark' tf=3 df=1 dominates; runner-up 'unique' (df=2) over
    # 'common' (df=3) at tf=1 since smaller df means larger idf
    top0 = sorted(by_doc[0], key=lambda r: r["rank"])
    assert top0[0]["keyword"] == "spark" and top0[0]["tf"] == 3
    assert top0[1]["keyword"] == "unique"
    # score formula replay: tf * (ln((N+1)/(df+1)) + 1), N=3
    exp = 3.0 * (math.log(4.0 / 2.0) + 1.0)
    assert abs(top0[0]["score"] - round(exp, 6)) < 1e-9


# ----------------------------------------------------------------- kmeans
def _np_kmeans(vecs, k, iters):
    ids = sorted(vecs)
    cents = [np.asarray(vecs[i], dtype=np.float64) for i in ids[:k]]
    for _ in range(iters + 1):
        assign = {}
        for vid in ids:
            v = np.asarray(vecs[vid], dtype=np.float64)
            d = [float(((v - c) ** 2).sum()) for c in cents]
            best = min(range(len(cents)), key=lambda j: (d[j], j))
            assign[vid] = (best, d[best])
        # final pass: stop before the update
        new_cents = []
        for j in range(len(cents)):
            members = [np.asarray(vecs[i], dtype=np.float64) for i in ids if assign[i][0] == j]
            if members:
                new_cents.append(np.mean(members, axis=0))
        cents = new_cents
    return assign


def test_kmeans_matches_numpy(spark):
    rng = np.random.RandomState(7)
    centers = rng.randn(3, 8) * 5.0
    # interleave blob membership (blob = vid % 3) so the deterministic
    # init (lowest-id vectors) seeds one centroid per blob
    vecs = {}
    for vid in range(36):
        c = vid % 3
        vecs[vid] = (centers[c] + rng.randn(8) * 0.3).astype(np.float32).tolist()
    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    )
    out = {r["vec_id"]: (r["cluster"], r["d2"]) for r in kmeans_assign(emb, k=3, iters=2).collect()}
    exp = _np_kmeans(vecs, 3, 2)
    assert set(out) == set(exp)
    for vid in exp:
        assert out[vid][0] == exp[vid][0], f"cluster mismatch for {vid}"
        assert abs(out[vid][1] - exp[vid][1]) < 1e-5, f"d2 mismatch for {vid}"
    # well-separated blobs: the 3 clusters each hold one blob
    blobs = {}
    for vid, (cl, _) in out.items():
        blobs.setdefault(vid % 3, set()).add(cl)
    assert all(len(s) == 1 for s in blobs.values()), blobs


def test_kmeans_cluster_ids_bounded(spark):
    rng = np.random.RandomState(3)
    emb = spark.createDataFrame(
        [(i, rng.randn(4).astype(np.float32).tolist()) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    out = kmeans_assign(emb, k=4, iters=1).collect()
    assert len(out) == 20
    assert all(0 <= r["cluster"] < 4 for r in out)


# --------------------------------------------------------------- sampling
def test_hex_threshold_edges():
    from incubator_hugegraph_computer_spark.functions.sampling import hex_threshold

    assert hex_threshold(0.0) == "00000000"
    assert hex_threshold(1.0) == "g"
    assert hex_threshold(0.5) == "80000000"
    # every 8-char hex string sorts below the rate>=1 sentinel
    assert "ffffffff" < hex_threshold(1.0)


def test_hash_split_disjoint_stable_proportions(spark):
    from incubator_hugegraph_computer_spark.functions.sampling import hash_split

    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    out = hash_split(df).groupBy("split").count().collect()
    got = {r["split"]: r["count"] for r in out}
    assert set(got) == {"train", "val", "test"}
    assert sum(got.values()) == 2000  # exhaustive + disjoint
    assert 0.75 * 2000 < got["train"] < 0.85 * 2000
    # deterministic: a re-run assigns every id to the same band
    again = {r["doc_id"]: r["split"] for r in hash_split(df).collect()}
    once = {r["doc_id"]: r["split"] for r in hash_split(df).collect()}
    assert again == once


def test_null_keys_have_deterministic_fate(spark):
    """NULL ids draw as the empty string (not routed to the last split /
    silently dropped); NULL domains form their own quantile stratum."""
    import hashlib

    from incubator_hugegraph_computer_spark.functions.sampling import (
        hash_split,
        quantile_buckets,
    )

    df = spark.createDataFrame(
        [(None, "a"), (1, "b"), (2, "c")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["split"] for r in hash_split(df).collect()}
    u_empty = hashlib.md5(b"").hexdigest()[:8]
    expect = "train" if u_empty < "cccccccc" else ("val" if u_empty < "e6666666" else "test")
    assert got[None] == expect
    assert len(got) == 3

    qdf = spark.createDataFrame(
        [(1, "en", 10.0), (2, "en", 20.0), (3, None, 5.0), (4, None, 50.0)],
        "doc_id long, lang string, v double",
    )
    out = {r["doc_id"]: r["bucket"] for r in quantile_buckets(qdf, "v").collect()}
    assert len(out) == 4  # NULL-domain rows retained, bucketed in their own stratum
    assert out[3] == "tail" and out[4] == "head"


def test_parse_props_rejects_column_collision(spark):
    import pytest

    from incubator_hugegraph_computer_spark.functions.semistructured import parse_props

    events = spark.createDataFrame([(1.0, '{"value": 3}')], "value double, props string")
    with pytest.raises(ValueError, match="collide"):
        parse_props(events, json_col="props", keys=("value",))


def test_media_null_payload_tolerated(spark):
    from incubator_hugegraph_computer_spark.functions.multimodal import (
        byte_stats,
        extract_features,
        frame_sample,
        media_from_documents,
        resize,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, "abcdefgh")], "doc_id long, text string"
    )
    media = media_from_documents(docs)  # doc 1 -> payload NULL
    bs = {r["media_id"]: r for r in byte_stats(media).collect()}
    assert bs[1]["n_bytes"] == 0 and bs[1]["byte_sum"] == 0
    feats = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert list(feats[1]) == [0.0] * 8  # zeros, never NaN
    assert not any(f != f for f in feats[2])  # short payload: no NaN either
    assert frame_sample(media).where("media_id = 1").count() == 0
    assert resize(media, 4).where("media_id = 1").count() == 1


def test_stratified_sample_nested_and_bounded(spark):
    from incubator_hugegraph_computer_spark.functions.sampling import (
        stratified_sample,
    )

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("fr").alias("lang"),
    )
    keep_all = stratified_sample(df, "lang", {"en": 1.0, "fr": 1.0})
    assert keep_all.count() == 1000
    none = stratified_sample(df, "lang", {}, default_rate=0.0)
    assert none.count() == 0
    small = {r["doc_id"] for r in stratified_sample(df, "lang", {"en": 0.2, "fr": 0.2}).collect()}
    big = {r["doc_id"] for r in stratified_sample(df, "lang", {"en": 0.6, "fr": 0.6}).collect()}
    # hash-threshold samples are nested: raising the rate only adds rows
    assert small <= big
    assert len(small) < len(big) < 1000


# --------------------------------------------------------- semantic dedup
def test_semantic_dedup_keeps_lowest_id(spark):
    from incubator_hugegraph_computer_spark.functions.similarity import (
        semantic_dedup,
    )

    # the k=3 lowest ids (0,1,2) are one per group, so lowest-id k-means
    # init seeds each group; 5,6 near-dup 0 and 11 near-dups 1
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [0.0, 0.0, 1.0]),  # singleton
        (5, [0.999, 0.001, 0.0]),
        (6, [0.998, 0.002, 0.0]),
        (11, [0.0, 0.999, 0.001]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in semantic_dedup(emb, k=3, iters=2, threshold=0.99).collect()}
    assert out[0]["keep"] == 1 and out[5]["keep"] == 0 and out[6]["keep"] == 0
    assert out[1]["keep"] == 1 and out[11]["keep"] == 0
    assert out[2]["keep"] == 1 and out[2]["n_lower_dups"] == 0
    assert out[6]["n_lower_dups"] == 2


def test_props_stats_parses_json_and_nulls(spark):
    from incubator_hugegraph_computer_spark.functions.semistructured import props_stats

    events = spark.createDataFrame(
        [
            (1, "click", 2.0, '{"k": 10}'),
            (2, "click", 4.0, '{"k": 20}'),
            (3, "view", 1.0, "not json"),  # corrupt row -> NULL k, not a crash
        ],
        "event_id long, event_type string, value double, props string",
    )
    out = {r["event_type"]: r for r in props_stats(events).collect()}
    assert out["click"]["n_events"] == 2
    assert out["click"]["sum_k"] == 30
    assert out["click"]["avg_k"] == 15.0
    assert out["click"]["avg_value"] == 3.0
    assert out["view"]["sum_k"] is None and out["view"]["n_events"] == 1


def test_dsir_logweights_python_replay(spark):
    """DSIR hashed-unigram importance weights match an exact Python
    replay (md5 buckets, add-one smoothed bucket LMs), and documents
    made of target-domain tokens outweigh off-domain ones."""
    import hashlib
    import math

    from pyspark.sql import functions as F

    from incubator_hugegraph_computer_spark.functions.sampling import (
        dsir_logweights,
    )

    rows = [
        (1, "spark join filter spark", "en"),
        (2, "banana apple banana", "zh"),
        (3, "spark filter", "en"),
        (4, "apple spark banana join", "zh"),
        (5, "", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["dsir_logweight"])
        for r in dsir_logweights(docs, F.col("lang") == "en").collect()
    }

    def bucket(w):
        return hashlib.md5(w.encode()).hexdigest()[:2]

    cr, ct = {}, {}
    for _, text, lang in rows:
        for w in text.split():
            b = bucket(w)
            cr[b] = cr.get(b, 0) + 1
            if lang == "en":
                ct[b] = ct.get(b, 0) + 1
    R, T = sum(cr.values()), sum(ct.values())
    lr = {
        b: math.log((ct.get(b, 0) + 1) / (T + 256.0))
        - math.log((cr[b] + 1) / (R + 256.0))
        for b in cr
    }
    for doc_id, text, _ in rows:
        toks = text.split()
        want = sum(lr[bucket(w)] for w in toks)
        assert got[doc_id][0] == len(toks)
        assert got[doc_id][1] == pytest.approx(want, abs=1e-6)
    # en-token docs score above the zh-token ones
    assert min(got[1][1], got[3][1]) > max(got[2][1], got[4][1])
    assert got[5] == (0, 0.0)  # token-less doc: empty product
