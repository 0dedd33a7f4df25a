"""Round-2 additions: weighted PageRank (Vermeer's
``pagerank.edge_weight_property``, pagerank.go:100-160), BM25 document
ranking, and the domain-mixture downsampler."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import PRWCC_EDGES, PRWCC_VERTEX_IDS, make_graph

from incubator_hugegraph_computer_spark.functions.sampling import domain_mix
from incubator_hugegraph_computer_spark.functions.text import bm25_scores
from incubator_hugegraph_computer_spark.graph import Graph
from incubator_hugegraph_computer_spark.operators.pagerank import (
    pagerank_classic,
    pagerank_weighted,
)


def _weight(s, d):
    return float((s + d) % 5 + 1)


def _weighted_graph(spark):
    g = make_graph(spark, PRWCC_EDGES, PRWCC_VERTEX_IDS)
    return Graph(
        g.vertices,
        g.edges.withColumn(
            "weight", ((F.col("src") + F.col("dst")) % 5 + 1).cast("double")
        ),
        num_partitions=4,
    ).cache()


def _pagerank_weighted_numpy(n, edges, index, iters, damping=0.85):
    """Vermeer recurrence, pagerank.go:144-158: contribution =
    rank/outdeg · w; outdeg = edge COUNT; dangling term unweighted."""
    outdeg = np.zeros(n)
    for s, _ in edges:
        outdeg[index[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        msg = np.zeros(n)
        for s, d in edges:
            msg[index[d]] += r[index[s]] / outdeg[index[s]] * _weight(s, d)
        dang = r[outdeg == 0].sum()
        r = (1.0 - damping) / n + damping * (msg + dang / n)
    return r


def test_pagerank_weighted_matches_numpy(spark):
    g = _weighted_graph(spark)
    got = {
        r["id"]: r["rank"]
        for r in pagerank_weighted(g, max_iterations=20, tol=0.0).collect()
    }
    ids = sorted(PRWCC_VERTEX_IDS)
    index = {v: i for i, v in enumerate(ids)}
    want = _pagerank_weighted_numpy(len(ids), PRWCC_EDGES, index, iters=20)
    got_vec = np.array([got[v] for v in ids])
    assert np.allclose(got_vec, want, atol=1e-9, rtol=0)


def test_pagerank_weighted_unit_weights_match_classic(spark):
    """w ≡ 1 degenerates to the unweighted classic formulation."""
    g = make_graph(spark, PRWCC_EDGES, PRWCC_VERTEX_IDS)
    g1 = Graph(
        g.vertices, g.edges.withColumn("weight", F.lit(1.0)), num_partitions=4
    ).cache()
    got = {
        r["id"]: r["rank"]
        for r in pagerank_weighted(g1, max_iterations=15, tol=0.0).collect()
    }
    want = {
        r["id"]: r["rank"]
        for r in pagerank_classic(g1, max_iterations=15, tol=0.0).collect()
    }
    for v in PRWCC_VERTEX_IDS:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_pagerank_weighted_unknown_property_raises(spark):
    g = make_graph(spark, PRWCC_EDGES, PRWCC_VERTEX_IDS)
    with pytest.raises(ValueError, match="unknown edge weighted property"):
        pagerank_weighted(g, weight_col="nope")


# ------------------------------------------------------------- BM25
DOCS = [
    (0, "spark join spark filter scan"),
    (1, "join join join merge"),
    (2, "sort merge window"),  # no query term
    (3, "spark"),
    (4, ""),  # empty document
]
QUERY = ["spark", "join", "filter"]


def _bm25_python(docs, terms, k1=1.2, b=0.75):
    toks = {i: t.split() for i, t in docs}
    n = float(len(docs))
    dls = {i: len(ws) for i, ws in toks.items()}
    avgdl = sum(dls.values()) / n
    df = {
        t: sum(1 for ws in toks.values() if t in ws)
        for t in terms
    }
    out = {}
    for i, ws in toks.items():
        s, hits = 0.0, 0
        for t in set(terms):
            tf = ws.count(t)
            if tf == 0:
                continue
            hits += 1
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * (tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dls[i] / avgdl)))
        out[i] = (hits, round(s, 6))
    return out


def test_bm25_matches_pure_python(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_hits"], r["score"])
        for r in bm25_scores(docs, QUERY).collect()
    }
    want = _bm25_python(DOCS, QUERY)
    assert set(got) == set(want)  # every doc returned, hits or not
    for i in want:
        assert got[i][0] == want[i][0]
        assert got[i][1] == pytest.approx(want[i][1], abs=1e-6)
    assert got[2] == (0, 0.0)
    assert got[4] == (0, 0.0)


def test_bm25_rare_term_outranks_common(spark):
    """idf ordering: a doc hit only by the rare term beats a doc hit
    only by the ubiquitous one at equal tf/length."""
    rows = [(i, "common filler words here") for i in range(20)]
    rows[0] = (0, "rare filler words here")
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["score"] for r in bm25_scores(docs, ["rare", "common"]).collect()}
    assert got[0] > got[1] > 0.0


# ------------------------------------------------------ domain mix
def _mix_docs(spark):
    rows = []
    for i in range(400):
        rows.append((i, "en"))
    for i in range(400, 480):
        rows.append((i, "zh"))
    for i in range(480, 520):
        rows.append((i, "de"))
    for i in range(520, 600):
        rows.append((i, "fr"))  # not targeted: dropped
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_domain_mix_proportions_and_binding_domain(spark):
    docs = _mix_docs(spark)
    targets = {"en": 0.5, "zh": 0.25, "de": 0.25}
    out = domain_mix(docs, targets).select("doc_id", "lang").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    # binding domain: de has 40 docs, 40/0.25 = 160 = min budget → all kept
    assert len(by_lang["de"]) == 40
    assert "fr" not in by_lang  # untargeted domains dropped
    # expected: en 80 (rate .2), zh 40 (rate .5) — hash sampling is
    # binomial around the target, so allow generous slack
    assert 55 <= len(by_lang["en"]) <= 105
    assert 25 <= len(by_lang["zh"]) <= 55
    # output rows are a subset of the input
    assert all(r["doc_id"] < 520 for r in out)


def test_domain_mix_deterministic(spark):
    docs = _mix_docs(spark)
    targets = {"en": 0.4, "zh": 0.6}
    a = sorted(r["doc_id"] for r in domain_mix(docs, targets).collect())
    b = sorted(r["doc_id"] for r in domain_mix(docs, targets).collect())
    assert a == b and len(a) > 0


def test_domain_mix_empty_targets_raise(spark):
    docs = _mix_docs(spark)
    with pytest.raises(ValueError):
        domain_mix(docs, {})
