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


def test_crawl_schedule_orders_hosts_by_priority(spark):
    from incubator_hugegraph_computer_spark.operators.crawl import crawl_schedule

    g = make_graph(spark, PRWCC_EDGES, PRWCC_VERTEX_IDS)
    rows = crawl_schedule(g, host_mod=2, delay_ms=100).collect()
    by_id = {r["id"]: r for r in rows}
    assert set(by_id) == set(PRWCC_VERTEX_IDS)
    # in-degree priority, ties by id ASC, independently per host (id%2)
    indeg = {}
    for _, d in PRWCC_EDGES:
        indeg[d] = indeg.get(d, 0) + 1
    for host in (0, 1):
        ids = [v for v in PRWCC_VERTEX_IDS if v % 2 == host]
        expect = sorted(ids, key=lambda v: (-indeg.get(v, 0), v))
        got = sorted(ids, key=lambda v: by_id[v]["slot"])
        assert got == expect
        slots = sorted(by_id[v]["slot"] for v in ids)
        assert slots == list(range(len(ids)))  # dense 0..k-1 per host
    assert all(r["fetch_ms"] == r["slot"] * 100 for r in rows)


def test_crawl_schedule_budget_and_custom_priority(spark):
    from incubator_hugegraph_computer_spark.operators.crawl import crawl_schedule

    g = make_graph(spark, PRWCC_EDGES, PRWCC_VERTEX_IDS)
    # priority = -id: lowest ids rank LAST; budget 1 keeps only the
    # highest-priority page of each host
    prio = g.vertices.selectExpr("id", "CAST(-id AS DOUBLE) AS priority")
    rows = crawl_schedule(g, host_mod=2, budget=1, priority=prio).collect()
    assert len(rows) == 2
    for r in rows:
        ids = [v for v in PRWCC_VERTEX_IDS if v % 2 == r["host"]]
        assert r["id"] == min(ids)  # -id DESC == id ASC
        assert r["slot"] == 0


def test_opic_is_a_probability_vector(spark):
    g = make_graph(spark, PRWCC_EDGES, PRWCC_VERTEX_IDS)
    vals = [r["opic"] for r in opic(g, iterations=3).collect()]
    assert sum(vals) == pytest.approx(1.0, abs=1e-9)
    assert all(v >= 0 for v in vals)
