"""Crawl-native operators: OPIC importance (and, below as they land,
frontier scheduling). OPIC verifies against a NumPy replay of the
synchronous cash/history recurrence on the golden PRWCC graph —
including dangling redistribution and the (H+C)/(T+1) normalization —
plus invariants: total cash stays 1, importances sum to 1."""

import numpy as np
import pytest

from tests.conftest import PRWCC_EDGES, PRWCC_VERTEX_IDS, make_graph

from incubator_hugegraph_computer_spark.operators.opic import opic


def _opic_numpy(ids, edges, iters):
    index = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    outdeg = np.zeros(n)
    for s, _ in edges:
        outdeg[index[s]] += 1
    cash = np.full(n, 1.0 / n)
    hist = np.zeros(n)
    for _ in range(iters):
        nxt = np.zeros(n)
        dangling = cash[outdeg == 0].sum()
        for s, d in edges:
            nxt[index[d]] += cash[index[s]] / outdeg[index[s]]
        nxt += dangling / n
        hist += cash
        cash = nxt
    return (hist + cash) / (iters + 1), index


def test_opic_matches_numpy(spark):
    g = make_graph(spark, PRWCC_EDGES, PRWCC_VERTEX_IDS)
    got = {r["id"]: r["opic"] for r in opic(g, iterations=4).collect()}
    exp, index = _opic_numpy(sorted(PRWCC_VERTEX_IDS), PRWCC_EDGES, 4)
    assert set(got) == set(PRWCC_VERTEX_IDS)
    for v in PRWCC_VERTEX_IDS:
        assert got[v] == pytest.approx(exp[index[v]], abs=1e-12)


def test_opic_is_a_probability_vector(spark):
    g = make_graph(spark, PRWCC_EDGES, PRWCC_VERTEX_IDS)
    vals = [r["opic"] for r in opic(g, iterations=3).collect()]
    assert sum(vals) == pytest.approx(1.0, abs=1e-9)
    assert all(v >= 0 for v in vals)
