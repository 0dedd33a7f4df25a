"""Batched PPR vs sequential, PIC invariants, containment dedup."""

from pyspark.sql import functions as F

from conftest import make_graph

from incubator_hugegraph_computer_spark.functions.dedup import (
    containment_pairs,
    ngram_jaccard_pairs,
)
from incubator_hugegraph_computer_spark.operators.pic import pic_scores
from incubator_hugegraph_computer_spark.operators.ppr import ppr, ppr_batch

EDGES = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (2, 6)]


def test_ppr_batch_matches_sequential(spark):
    g = make_graph(spark, EDGES)
    seeds = spark.createDataFrame([(1,), (3,)], "seed long")
    batch = {
        (r["seed"], r["id"]): round(r["rank"], 9)
        for r in ppr_batch(g, seeds, iterations=4).collect()
    }
    for s in (1, 3):
        solo = {
            r["id"]: round(r["rank"], 9)
            for r in ppr(g, source=s, max_iterations=4, tol=0.0).collect()
            if r["rank"] > 0
        }
        got = {vid: rk for (sd, vid), rk in batch.items() if sd == s}
        assert got.keys() == solo.keys()
        for vid in solo:
            assert abs(got[vid] - solo[vid]) < 1e-9, (s, vid)


def test_pic_l1_normalized_and_symmetric(spark):
    # two disjoint triangles: PIC value is constant within each, and
    # the whole vector sums to 1 (L1 renormalization)
    g = make_graph(spark, [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4)])
    rows = pic_scores(g, iterations=4).collect()
    vals = {r["id"]: r["pic"] for r in rows}
    assert vals[1] == vals[2] == vals[3]
    assert vals[4] == vals[5] == vals[6]
    assert abs(sum(vals.values()) - 1.0) < 1e-5


def test_containment_catches_subdocument(spark):
    sub = "alpha beta gamma delta epsilon zeta"
    sup = sub + " eta theta iota kappa lambda mu nu xi omicron pi rho sigma"
    docs = spark.createDataFrame(
        [(1, sub), (2, sup), (3, "unrelated words only here today")],
        "doc_id long, text string",
    )
    cont = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in containment_pairs(docs, n=3, threshold=0.5).collect()
    }
    # every 3-gram of doc 1 appears in doc 2 -> containment 1.0 from 1's side
    assert cont[(1, 2)] == 1.0
    assert (2, 1) not in cont  # asymmetric: 2 is much larger
    # jaccard misses the inclusion at the same bar
    jac = ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    assert not any(r["doc_a"] == 1 and r["doc_b"] == 2 for r in jac)
