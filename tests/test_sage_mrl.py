"""GraphSAGE sampling and Matryoshka staged retrieval."""

import hashlib

from pyspark.sql import functions as F

from conftest import make_graph

from incubator_hugegraph_computer_spark.functions.similarity import (
    cosine_topk,
    mrl_topk,
)
from incubator_hugegraph_computer_spark.operators.embeddings import sage_sample


def test_sage_sample_bounded_and_deterministic(spark):
    # hub 1 with 20 out-neighbors; each neighbor points at 2 more
    edges = [(1, 10 + i) for i in range(20)] + [
        (10 + i, 100 + 2 * i + d) for i in range(20) for d in (0, 1)
    ]
    g = make_graph(spark, edges)
    seeds = spark.createDataFrame([(1,)], "id long")
    rows = sage_sample(g, seeds, fanouts=(5, 3), seed=7).collect()
    l1 = [(r["src"], r["dst"]) for r in rows if r["layer"] == 1]
    l2 = [(r["src"], r["dst"]) for r in rows if r["layer"] == 2]
    assert len(l1) == 5  # hub fanout capped at 5, not 20
    assert all(s == 1 for s, _ in l1)
    # layer-2 frontier = the 5 sampled targets; each has 2 <= 3 succs
    l1_dsts = {d for _, d in l1}
    assert {s for s, _ in l2} == l1_dsts
    assert len(l2) == 10
    # md5 determinism: the sampled 5 are the ones with smallest hash
    def key(d):
        return hashlib.md5(f"1:{d}:1:7".encode()).hexdigest()
    expect = set(sorted(range(10, 30), key=lambda d: (key(d), d))[:5])
    assert l1_dsts == expect


def test_mrl_full_candidates_equals_exact(spark):
    import random

    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(32)]) for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.where(F.col("vec_id") < 2)
    # candidates >= corpus: staged result must equal exact brute force
    staged = {(r["query_id"], r["rank"]): r["vec_id"]
              for r in mrl_topk(emb, q, k=5, prefix_dim=8, candidates=100).collect()}
    exact = {(r["query_id"], r["rank"]): r["vec_id"]
             for r in cosine_topk(emb, q, k=5).collect()}
    assert staged == exact

    # narrow candidates still returns k rows per query
    narrow = mrl_topk(emb, q, k=5, prefix_dim=8, candidates=10).collect()
    assert len(narrow) == 10
