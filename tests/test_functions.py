"""Unit tests for the training-data pipeline functions over hand-built
corpora with known answers."""

import pytest
from pyspark.sql import functions as F

from incubator_hugegraph_computer_spark.functions.dedup import (
    exact_duplicates,
    minhash_candidates,
    ngram_jaccard_pairs,
    shingles,
    simhash_near_duplicates,
    simhash_signatures,
)
from incubator_hugegraph_computer_spark.functions.similarity import (
    ann_lsh_topk,
    cosine_topk,
    embedding_near_duplicates,
    lsh_buckets,
)
from incubator_hugegraph_computer_spark.functions.text import analyze


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "the quick brown fox jumps over the lazy dog", "en"),  # exact dup of 0
        (2, "the quick brown fox jumps over a lazy dog today", "en"),  # near dup
        (3, "der hund ist und der die das haus", "de"),
        (4, "completely different text about spark engines and shuffles", "en"),
        (5, "zzz qqq xxx", "und"),
    ]
    return spark.createDataFrame(
        [(i, t, l, len(t)) for i, t, l in rows],
        "doc_id long, text string, lang string, n_chars long",
    ).persist()


def test_exact_dedup(spark, docs):
    got = {(r["doc_id"], r["canonical_id"]) for r in exact_duplicates(docs).collect()}
    assert got == {(0, 0), (1, 0)}


def test_shingles(spark, docs):
    sh = shingles(docs.where("doc_id = 5"), n=3).collect()
    assert {r["shingle"] for r in sh} == {"zzz qqq xxx"}


def test_ngram_jaccard_finds_near_dup(spark, docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.3).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and 0.3 <= pairs[(0, 2)] < 1.0
    assert (1, 2) in pairs
    assert all(a < b for a, b in pairs)


def test_minhash_agrees_with_exact_jaccard(spark, docs):
    """Every minhash candidate pair above threshold must carry the true
    jaccard (verified stage) and include the exact duplicates."""
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_candidates(docs, threshold=0.3).collect()
    }
    assert got[(0, 1)] == 1.0
    want = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.3).collect()
    }
    for pair, j in got.items():
        assert want[pair] == j  # LSH candidates are a subset with equal scores


def test_simhash_properties(spark, docs):
    sig = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs).collect()}
    assert sig[0] == sig[1]  # identical docs → identical fingerprint
    assert all(0 <= s < 2**32 for s in sig.values())
    near = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_duplicates(docs, max_hamming=3).collect()
    }
    assert near[(0, 1)] == 0
    # the 4-byte banding can't guarantee recall past hamming 3 — refuse
    import pytest

    with pytest.raises(ValueError, match="max_hamming"):
        simhash_near_duplicates(docs, max_hamming=10)


def test_text_analyze(spark, docs):
    got = {r["doc_id"]: r for r in analyze(docs).collect()}
    assert got[0]["n_tokens"] == 9
    assert got[0]["lang_pred"] == "en"
    assert got[3]["lang_pred"] == "de"
    assert got[5]["lang_pred"] == "und"
    assert got[0]["fingerprint"] == got[1]["fingerprint"]
    assert 0.0 <= got[5]["quality"] <= 1.0


@pytest.fixture(scope="module")
def emb(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(size=(20, 16)).astype("float32")
    base[1] = base[0] + rng.normal(scale=1e-3, size=16).astype("float32")  # near dup of 0
    rows = [(i, [float(x) for x in base[i]], 0) for i in range(20)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).persist()


def test_cosine_topk_exact(spark, emb):
    import numpy as np

    got = cosine_topk(emb, emb.where("vec_id = 0"), k=3).collect()
    assert [r["rank"] for r in got] == [1, 2, 3]
    assert got[0]["vec_id"] == 1  # the planted near-duplicate
    assert got[0]["score"] > 0.999
    # verify against numpy
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in emb.collect()}
    v0 = vecs[0]
    sims = {
        i: float(v.dot(v0) / (np.linalg.norm(v) * np.linalg.norm(v0)))
        for i, v in vecs.items()
        if i != 0
    }
    want_top = sorted(sims, key=lambda i: (-sims[i], i))[:3]
    assert [r["vec_id"] for r in got] == want_top


def test_lsh_recall_of_planted_duplicate(spark, emb):
    b = {r["vec_id"]: r["bucket"] for r in lsh_buckets(emb, num_planes=8).collect()}
    assert b[0] == b[1]  # near-identical vectors land in the same bucket
    near = embedding_near_duplicates(emb, threshold=0.999).collect()
    assert {(r["vec_a"], r["vec_b"]) for r in near} == {(0, 1)}
    ann = ann_lsh_topk(emb, k=1, num_planes=8)
    top0 = {r["query_id"]: r["vec_id"] for r in ann.collect()}
    assert top0[0] == 1


def test_repetition_stats(spark):
    from incubator_hugegraph_computer_spark.functions.text import repetition_stats

    rows = [
        (0, "a b a b c"),       # 5 toks, 3 distinct; bigrams a_b b_a a_b b_c -> 3 distinct/4
        (1, "x x x x"),         # 4 toks 1 distinct; bigrams x_x ×3 -> 1/3
        (2, "unique words only here"),  # no repetition at all
        (3, ""),                # empty doc
        (4, "solo"),            # 1 token, no bigrams
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, n_chars long",
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(docs).collect()}
    assert got[0]["n_tokens"] == 5
    assert got[0]["dup_word_frac"] == round(1 - 3 / 5, 6)
    assert got[0]["top_word_share"] == round(2 / 5, 6)
    assert got[0]["dup_bigram_frac"] == round(1 - 3 / 4, 6)
    assert got[1]["dup_word_frac"] == 0.75
    assert got[1]["top_word_share"] == 1.0
    assert got[1]["dup_bigram_frac"] == round(1 - 1 / 3, 6)
    assert got[2]["dup_word_frac"] == 0.0
    assert got[2]["top_word_share"] == 0.25
    assert got[2]["dup_bigram_frac"] == 0.0
    assert got[3] == {
        "doc_id": 3, "n_tokens": 0, "dup_word_frac": 0.0,
        "top_word_share": 0.0, "dup_bigram_frac": 0.0,
    }
    assert got[4]["n_tokens"] == 1
    assert got[4]["top_word_share"] == 1.0
    assert got[4]["dup_bigram_frac"] == 0.0
