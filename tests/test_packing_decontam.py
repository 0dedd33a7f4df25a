"""Sequence packing (concat-and-chunk layout) and benchmark
decontamination (n-gram overlap vs a broadcast eval set)."""

import pytest
from pyspark.sql import functions as F

from incubator_hugegraph_computer_spark.functions.dedup import decontaminate
from incubator_hugegraph_computer_spark.functions.packing import (
    pack_sequences,
    packing_efficiency,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "alpha beta gamma delta"),            # 4 tokens
        (2, "one two three four five six seven"),  # 7
        (3, ""),                                   # 0
        (4, "x " * 10),                            # 10
        (5, "tail end tokens here"),               # 4
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_matches_naive_prefix_sum(spark, docs):
    budget = 8
    out = {r["doc_id"]: r for r in pack_sequences(docs, budget=budget).collect()}
    # naive reference layout in pure python
    toks = {1: 4, 2: 7, 3: 0, 4: 10, 5: 4}
    off = 0
    for did in sorted(toks):
        n = toks[did]
        r = out[did]
        assert r["n_tokens"] == n
        assert r["start_offset"] == off
        assert r["seq_first"] == off // budget
        if n > 0:
            assert r["seq_last"] == (off + n - 1) // budget
            assert r["n_seqs"] == r["seq_last"] - r["seq_first"] + 1
        else:
            assert r["seq_last"] == r["seq_first"]
            assert r["n_seqs"] == 0
        off += n


def test_pack_offsets_partition_invariant(spark, docs):
    """The layout must not depend on input partitioning — the
    partition-offset prefix sum has to equal the global window."""
    a = pack_sequences(docs.repartition(7), budget=8).orderBy("doc_id").collect()
    b = pack_sequences(docs.coalesce(1), budget=8).orderBy("doc_id").collect()
    assert a == b


def test_pack_rejects_bad_budget(spark, docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, budget=0)


def test_packing_efficiency_summary(spark, docs):
    budget = 8
    packed = pack_sequences(docs, budget=budget)
    s = packing_efficiency(packed, budget).collect()[0]
    assert s["n_docs"] == 5
    assert s["total_tokens"] == 25
    assert s["n_sequences"] == (25 + budget - 1) // budget  # 4
    assert s["fill_ratio"] == pytest.approx(25 / (4 * budget), abs=1e-6)
    # doc 2 spans tokens [4..10] -> seqs 0,1 ; doc 4 [11..20] -> 1,2 ;
    # doc 5 [21..24] -> 2,3
    assert s["n_straddlers"] == 3


def test_decontaminate_flags_quoting_docs(spark):
    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    tr = spark.createDataFrame(
        [
            (1, "he said the quick brown fox jumps high"),  # shares 3-grams
            (2, "completely unrelated training content here"),
            (3, "ab"),  # too short for a 3-gram
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in decontaminate(tr, ev, n=3).collect()}
    assert set(out) == {1, 2, 3}
    # doc1 tokens: he said the quick brown fox jumps high -> 6 shingles;
    # shared with eval: "the quick brown","quick brown fox","brown fox jumps"
    assert out[1]["n_shingles"] == 6
    assert out[1]["n_contaminated"] == 3
    assert out[1]["contaminated_frac"] == pytest.approx(0.5)
    assert out[2]["n_contaminated"] == 0
    assert out[2]["contaminated_frac"] == 0.0
    assert out[3]["n_shingles"] == 0
    assert out[3]["contaminated_frac"] == 0.0


def test_decontaminate_no_eval_rows(spark):
    tr = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    ev = tr.where(F.lit(False))
    out = decontaminate(tr, ev, n=3).collect()
    assert len(out) == 1 and out[0]["n_contaminated"] == 0


def test_chunk_documents_windows(spark):
    from incubator_hugegraph_computer_spark.functions.packing import chunk_documents

    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x y"), (3, "")],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, window=4, stride=3).collect()
    by = {(r["doc_id"], r["chunk_id"]): (r["n_chunk_tokens"], r["chunk_text"]) for r in out}
    # doc 1: 7 tokens -> starts 1, 4, 7
    assert by[(1, 0)] == (4, "a b c d")
    assert by[(1, 1)] == (4, "d e f g")
    assert by[(1, 2)] == (1, "g")          # short tail chunk
    assert by[(2, 0)] == (2, "x y")        # doc shorter than window
    assert all(d != 3 for d, _ in by)      # empty doc -> no chunks
    assert len(by) == 4

    try:
        chunk_documents(docs, window=0, stride=3)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_shuffle_shards_deterministic_and_uniform(spark):
    from incubator_hugegraph_computer_spark.functions.sampling import (
        shuffle_shards,
        shuffle_shard_stats,
    )

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(400)], "doc_id long, text string"
    )
    a = {r["doc_id"]: (r["shard"], r["shuffle_key"])
         for r in shuffle_shards(docs).collect()}
    b = {r["doc_id"]: (r["shard"], r["shuffle_key"])
         for r in shuffle_shards(docs).collect()}
    assert a == b  # same salt -> identical permutation
    c = {r["doc_id"]: r["shuffle_key"]
         for r in shuffle_shards(docs, salt="epoch-2").collect()}
    assert any(c[i] != a[i][1] for i in a)  # new salt -> new order
    stats = shuffle_shard_stats(docs, prefix_len=1).collect()
    assert sum(r["n_docs"] for r in stats) == 400
    # 16 hex buckets, roughly uniform
    assert len(stats) == 16
    assert all(r["n_tokens"] == 3 * r["n_docs"] for r in stats)
    for r in stats:
        assert r["first_key"] <= r["last_key"]
        assert r["first_key"].startswith(r["shard"])
