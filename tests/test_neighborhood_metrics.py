"""Harmonic centrality, neighborhood function (exact + HyperANF),
conductance, lexical diversity, hourly anomaly."""

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import make_graph


def _rows(df, *cols):
    return {tuple(r[c] for c in cols[:-1]) if len(cols) > 2 else r[cols[0]]: r[cols[-1]]
            for r in df.collect()}


# ---------------------------------------------------------------- harmonic
def test_harmonic_path_graph(spark):
    # 1 -> 2 -> 3: h(1) = 1 + 1/2, h(2) = 1, h(3) = 0
    from incubator_hugegraph_computer_spark.operators.harmonic import harmonic

    g = make_graph(spark, [(1, 2), (2, 3)])
    out = {r["id"]: r for r in harmonic(g).collect()}
    assert out[1]["harmonic"] == pytest.approx(1.5)
    assert out[2]["harmonic"] == pytest.approx(1.0)
    assert out[3]["harmonic"] == pytest.approx(0.0)
    # WF(1): r-1 = 2 reached, sumd = 3, n = 3 -> (2/3) * (2/2) = 2/3
    assert out[1]["wf_closeness"] == pytest.approx(2.0 / 3.0)
    assert out[3]["wf_closeness"] == pytest.approx(0.0)


def test_harmonic_sources_subset(spark):
    from incubator_hugegraph_computer_spark.operators.harmonic import harmonic

    g = make_graph(spark, [(1, 2), (2, 3), (3, 1)])
    seeds = spark.createDataFrame([(1,)], "id long")
    out = harmonic(g, sources=seeds).collect()
    assert len(out) == 1 and out[0]["id"] == 1
    assert out[0]["harmonic"] == pytest.approx(1.0 + 0.5)


# ---------------------------------------------------- neighborhood function
def test_neighborhood_exact_path(spark):
    from incubator_hugegraph_computer_spark.operators.neighborhood import (
        effective_diameter,
        neighborhood_function,
    )

    g = make_graph(spark, [(1, 2), (2, 3), (3, 4)])
    nf = {r["id"]: r for r in neighborhood_function(g, max_h=3, exact=True).collect()}
    assert (nf[1]["n1"], nf[1]["n2"], nf[1]["n3"]) == (1, 2, 3)
    assert (nf[3]["n1"], nf[3]["n2"], nf[3]["n3"]) == (1, 1, 1)
    assert (nf[4]["n1"], nf[4]["n2"], nf[4]["n3"]) == (0, 0, 0)
    ed = effective_diameter(
        neighborhood_function(g, max_h=3, exact=True), max_h=3
    ).collect()[0]
    assert 1 <= ed["eff_diameter"] <= 3


def test_neighborhood_hyperanf_close_to_exact(spark):
    """The HLL-sketch path (the 100 TB strategy) tracks the exact counts
    — at these cardinalities DataSketches HLL is in sparse mode, so the
    estimates are near-exact."""
    from incubator_hugegraph_computer_spark.operators.neighborhood import (
        neighborhood_function,
    )

    edges = [(i, (i * 7 + 3) % 40) for i in range(40)] + [(i, i + 1) for i in range(39)]
    g = make_graph(spark, [(s, d) for s, d in edges if s != d])
    exact = {r["id"]: r for r in neighborhood_function(g, max_h=2, exact=True).collect()}
    approx = {r["id"]: r for r in neighborhood_function(g, max_h=2, exact=False).collect()}
    assert set(exact) == set(approx)
    for vid, e in exact.items():
        a = approx[vid]
        for h in (1, 2):
            assert a[f"n{h}"] == pytest.approx(e[f"n{h}"], rel=0.05, abs=1.5)


# ------------------------------------------------------------- conductance
def test_conductance_two_triangles(spark):
    """Two triangles bridged by one edge; labels = triangle membership.
    Each community: size 3, volume 7 (sym degree sum), cut 1 ->
    conductance 1/7."""
    from incubator_hugegraph_computer_spark.operators.conductance import conductance

    g = make_graph(
        spark, [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (3, 4)]
    )
    labels = spark.createDataFrame(
        [(i, 100 if i <= 3 else 200) for i in range(1, 7)], "id long, label long"
    )
    out = {r["label"]: r for r in conductance(g, labels).collect()}
    for lab in (100, 200):
        assert out[lab]["size"] == 3
        assert out[lab]["volume"] == 7
        assert out[lab]["cut"] == 1
        assert out[lab]["conductance"] == pytest.approx(1.0 / 7.0)


def test_conductance_isolated_label(spark):
    from incubator_hugegraph_computer_spark.operators.conductance import conductance

    g = make_graph(spark, [(1, 2)], vertex_ids=[1, 2, 3])
    labels = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99)], "id long, label long"
    )
    out = {r["label"]: r for r in conductance(g, labels).collect()}
    assert out[99]["volume"] == 0 and out[99]["conductance"] == 0.0
    assert out[10]["cut"] == 0 and out[10]["conductance"] == 0.0


# ---------------------------------------------------------- text diversity
def test_diversity_stats(spark):
    from incubator_hugegraph_computer_spark.functions.text import diversity_stats

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "x y z"), (3, "")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in diversity_stats(docs).collect()}
    assert out[1]["n_tokens"] == 3
    assert out[1]["ttr"] == pytest.approx(2 / 3, abs=1e-6)
    expected_h = math.log(3) - (2 * math.log(2)) / 3
    assert out[1]["word_entropy"] == pytest.approx(expected_h, abs=1e-6)
    assert out[2]["word_entropy"] == pytest.approx(math.log(3), abs=1e-6)
    assert out[3]["n_tokens"] == 0 and out[3]["ttr"] == 0.0


# ---------------------------------------------------------- hourly anomaly
def test_hourly_anomaly(spark):
    from incubator_hugegraph_computer_spark.streaming.events import hourly_anomaly

    rows = []
    eid = 0
    for hour in range(6):
        n = 100 if hour == 3 else 10  # one spike hour for type 'click'
        for _ in range(n):
            rows.append((eid, f"2024-01-01 0{hour}:15:00", "click"))
            eid += 1
        rows.append((eid, f"2024-01-01 0{hour}:30:00", "view"))  # constant
        eid += 1
    events = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = hourly_anomaly(events)
    flagged = [r for r in out.collect() if r["is_anomaly"]]
    assert len(flagged) == 1
    assert flagged[0]["event_type"] == "click" and flagged[0]["n_events"] == 100
    views = [r for r in out.collect() if r["event_type"] == "view"]
    assert all(r["z"] == 0.0 and not r["is_anomaly"] for r in views)


# ----------------------------------------------------- incremental WCC
def test_wcc_incremental_matches_full(spark):
    from incubator_hugegraph_computer_spark.graph import Graph
    from incubator_hugegraph_computer_spark.operators.wcc import wcc, wcc_incremental

    # deterministic pseudo-random graph, split into halves by hash
    edges = [(i, (i * 13 + 7) % 50) for i in range(120)]
    edges = [(s, d) for s, d in edges if s != d]
    e_old = [(s, d) for s, d in edges if (s + d) % 2 == 0]
    e_new = [(s, d) for s, d in edges if (s + d) % 2 == 1]
    g_old = make_graph(spark, e_old)
    prev = wcc(g_old, count_messages=False)
    delta = spark.createDataFrame(e_new, "src long, dst long")
    inc = {r["id"]: r["comp"] for r in wcc_incremental(prev, delta).collect()}
    full = {
        r["id"]: r["comp"]
        for r in wcc(make_graph(spark, edges), count_messages=False).collect()
    }
    assert inc == full


def test_wcc_incremental_empty_delta(spark):
    from incubator_hugegraph_computer_spark.operators.wcc import wcc, wcc_incremental

    g = make_graph(spark, [(1, 2), (3, 4)])
    prev = wcc(g, count_messages=False)
    delta = spark.createDataFrame([], "src long, dst long")
    out = {r["id"]: r["comp"] for r in wcc_incremental(prev, delta).collect()}
    assert out == {r["id"]: r["comp"] for r in prev.collect()}


def test_wcc_incremental_new_vertices_and_merge(spark):
    from incubator_hugegraph_computer_spark.operators.wcc import wcc, wcc_incremental

    g = make_graph(spark, [(1, 2), (10, 11)])
    prev = wcc(g, count_messages=False)
    # delta bridges the two old components THROUGH a brand-new vertex,
    # and adds a disconnected new pair
    delta = spark.createDataFrame(
        [(2, 99), (99, 10), (200, 201)], "src long, dst long"
    )
    out = {r["id"]: r["comp"] for r in wcc_incremental(prev, delta).collect()}
    assert out == {1: 1, 2: 1, 10: 1, 11: 1, 99: 1, 200: 200, 201: 200}


def test_wcc_stream_matches_batch(spark, tmp_path):
    import os
    import time

    from incubator_hugegraph_computer_spark.operators.wcc import wcc
    from incubator_hugegraph_computer_spark.streaming.graph_ingest import (
        read_components,
        run_wcc_stream,
    )

    edges = [(i, (i * 17 + 3) % 30) for i in range(90)]
    edges = [(s, d) for s, d in edges if s != d]
    src = tmp_path / "edges"
    src.mkdir()
    for chunk in range(3):
        part = edges[chunk * 30 : (chunk + 1) * 30]
        df = spark.createDataFrame(part, "src long, dst long").coalesce(1)
        pdir = str(src / f"chunk{chunk}.parquet")
        df.write.mode("overwrite").parquet(pdir + ".tmp")
        fname = [f for f in os.listdir(pdir + ".tmp") if f.endswith(".parquet")][0]
        dest = str(src / f"part-{chunk:05d}.parquet")
        os.rename(os.path.join(pdir + ".tmp", fname), dest)
        ts = time.time() + chunk
        os.utime(dest, (ts, ts))

    run_wcc_stream(
        spark, str(src), str(tmp_path / "ck"), str(tmp_path / "labels"),
        max_files_per_trigger=1,
    )
    streamed = {
        r["id"]: r["comp"]
        for r in read_components(spark, str(tmp_path / "labels")).collect()
    }
    full = {
        r["id"]: r["comp"]
        for r in wcc(make_graph(spark, edges), count_messages=False).collect()
    }
    assert streamed == full


# ------------------------------------------------------------ Luby MIS
def _python_luby(edges, vertices, rounds=20, seed=42):
    import hashlib

    adj = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    alive = set(vertices)
    ae = {v: set(n for n in adj.get(v, ()) if n in alive) for v in alive}
    mis = set()
    for r in range(1, rounds + 1):
        if not alive:
            break
        pri = {
            v: hashlib.md5(f"{v}:{seed}:{r}".encode()).hexdigest() for v in alive
        }
        winners = {
            v for v in alive
            if all(pri[v] < pri[n] for n in ae[v])
        }
        mis |= winners
        removed = set(winners)
        for w in winners:
            removed |= ae[w]
        alive -= removed
        ae = {v: {n for n in ae[v] if n in alive} for v in alive}
    return mis


def test_mis_matches_python_replay(spark):
    from incubator_hugegraph_computer_spark.operators.mis import (
        maximal_independent_set,
    )

    edges = [(i, (i * 11 + 5) % 60) for i in range(150)]
    edges = [(s, d) for s, d in edges if s != d]
    vertices = sorted({v for e in edges for v in e})
    g = make_graph(spark, edges)
    out = {
        r["id"]: r["in_mis"]
        for r in maximal_independent_set(g, max_rounds=20).collect()
    }
    expected = _python_luby(edges, vertices)
    assert {v for v, m in out.items() if m} == expected

    # independence: no symmetrized edge inside the MIS
    for s, d in edges:
        assert not (out[s] and out[d])
    # maximality: every non-MIS vertex has a MIS neighbor
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    for v, m in out.items():
        if not m:
            assert any(out[n] for n in adj.get(v, ())), v


def test_mis_isolated_vertices_join(spark):
    from incubator_hugegraph_computer_spark.operators.mis import (
        maximal_independent_set,
    )

    g = make_graph(spark, [(1, 2)], vertex_ids=[1, 2, 3])
    out = {r["id"]: r["in_mis"] for r in maximal_independent_set(g).collect()}
    assert out[3] is True
    assert out[1] != out[2]  # exactly one endpoint of the edge


# ------------------------------------------------------------ seeded LPA
def test_lpa_seeded_propagation(spark):
    """Two seed labels at the ends of a path: each vertex adopts the
    nearer seed's label (min-label on the midpoint tie); seeds stay."""
    from incubator_hugegraph_computer_spark.operators.lpa import lpa_seeded

    # path 1-2-3-4-5, seeds: 1 -> label 10, 5 -> label 20. Hand replay of
    # the sync-recompute rule: round 1 labels 2:10 and 4:20 (3 hears
    # nothing); round 2 labels 3 with the {10,20} tie -> min = 10.
    # (Later rounds keep eroding tie vertices toward the min label —
    # 4 would flip at round 3 when {3:10, 5:20} ties — deterministic,
    # replayed exactly by the SQL oracle.)
    g = make_graph(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    seeds = spark.createDataFrame([(1, 10), (5, 20)], "id long, label long")
    out = {r["id"]: r["label"] for r in lpa_seeded(g, seeds, rounds=2).collect()}
    assert out == {1: 10, 2: 10, 3: 10, 4: 20, 5: 20}
    out3 = {r["id"]: r["label"] for r in lpa_seeded(g, seeds, rounds=3).collect()}
    assert out3[4] == 10 and out3[5] == 20  # tie erosion; seed frozen


def test_lpa_seeded_unreached_stay_null(spark):
    from incubator_hugegraph_computer_spark.operators.lpa import lpa_seeded

    g = make_graph(spark, [(1, 2)], vertex_ids=[1, 2, 3])
    seeds = spark.createDataFrame([(1, 7)], "id long, label long")
    out = {r["id"]: r["label"] for r in lpa_seeded(g, seeds, rounds=3).collect()}
    assert out[1] == 7 and out[2] == 7
    assert out[3] is None


# ------------------------------------------------------------- landmarks
def test_landmark_distances_and_estimate(spark):
    from incubator_hugegraph_computer_spark.operators.landmarks import (
        estimate_distance,
        landmark_distances,
    )

    # directed table: cycle 1->2->3->4->1 plus chord 2->4
    g = make_graph(spark, [(1, 2), (2, 3), (3, 4), (4, 1), (2, 4)])
    lm = spark.createDataFrame([(1,), (3,)], "id long")
    t = landmark_distances(g, lm)
    d = {(r["landmark"], r["id"]): r["dist"] for r in t.collect()}
    assert d[(1, 1)] == 0 and d[(1, 2)] == 1 and d[(1, 4)] == 2 and d[(1, 3)] == 2
    assert d[(3, 4)] == 1 and d[(3, 1)] == 2

    # estimation contract: UNDIRECTED table; est is a triangle-inequality
    # upper bound, exact when a landmark sits on a shortest path
    tu = landmark_distances(g.symmetrized(), lm)
    pairs = spark.createDataFrame([(2, 3), (4, 2)], "u long, v long")
    est = {(r["u"], r["v"]): r["est_dist"] for r in estimate_distance(tu, pairs).collect()}
    assert est[(2, 3)] == 1  # landmark 3 on the shortest path -> exact
    assert est[(4, 2)] >= 1  # true undirected d = 1 (chord); bound holds
    assert est[(4, 2)] == 2  # min over {1, 3}: 1+1 both ways


# ---------------------------------------------------------- hitting time
def test_hitting_time_path(spark):
    """Chain 3 -> 2 -> 1 with target {1}: h(1)=0, h(2)=1, h(3)=2;
    dangling/unreachable vertices sit at the horizon."""
    from incubator_hugegraph_computer_spark.operators.hitting_time import (
        hitting_time,
    )

    g = make_graph(spark, [(3, 2), (2, 1), (4, 5)], vertex_ids=[1, 2, 3, 4, 5])
    targets = spark.createDataFrame([(1,)], "id long")
    out = {r["id"]: r["hitting_time"] for r in hitting_time(g, targets, horizon=6).collect()}
    assert out[1] == 0.0 and out[2] == 1.0 and out[3] == 2.0
    assert out[5] == 6.0  # dangling, not a target
    assert out[4] == 6.0  # only route leads to a horizon-capped dangler


def test_hitting_time_branching(spark):
    """Vertex with two out-edges: one to the target, one to a dead end —
    h = 1 + (0 + K)/2 capped at K."""
    from incubator_hugegraph_computer_spark.operators.hitting_time import (
        hitting_time,
    )

    g = make_graph(spark, [(2, 1), (2, 9)], vertex_ids=[1, 2, 9])
    targets = spark.createDataFrame([(1,)], "id long")
    out = {r["id"]: r["hitting_time"] for r in hitting_time(g, targets, horizon=8).collect()}
    assert out[2] == 1.0 + (0.0 + 8.0) / 2.0


def test_powerlaw_alpha_matches_numpy(spark):
    import numpy as np
    import pytest as _pt

    from incubator_hugegraph_computer_spark.operators.stats import powerlaw_alpha
    from tests.conftest import make_graph

    rng = np.random.RandomState(23)
    n = 40
    edges = sorted({(int(a), int(b)) for a, b in rng.randint(0, n, (250, 2)) if a != b})
    g = make_graph(spark, edges)
    indeg = {}
    for _, b in edges:
        indeg[b] = indeg.get(b, 0) + 1
    dmin = 2
    tail = [d for d in indeg.values() if d >= dmin]
    alpha_ref = 1.0 + len(tail) / sum(np.log(d / (dmin - 0.5)) for d in tail)
    row = powerlaw_alpha(g, dmin=dmin, direction="in").collect()[0]
    assert row.n_tail == len(tail)
    assert row.alpha == _pt.approx(alpha_ref, abs=1e-9)


def test_powerlaw_alpha_exact_on_pure_powerlaw(spark):
    """A synthetic tail with d_i = round(x^(-1/(a-1))) recovers a≈the
    planted exponent within the small-sample bias of the MLE."""
    import numpy as np
    import pytest as _pt

    from incubator_hugegraph_computer_spark.operators.stats import powerlaw_alpha
    from tests.conftest import make_graph

    # plant in-degrees by wiring d parallel sources into each sink
    rng = np.random.RandomState(31)
    planted = (rng.pareto(1.5, 60) + 1).astype(int) + 1  # alpha = 2.5
    edges = []
    src = 10_000
    for sink, d in enumerate(planted):
        for _ in range(int(d)):
            edges.append((src, sink))
            src += 1
    g = make_graph(spark, edges)
    row = powerlaw_alpha(g, dmin=2, direction="in").collect()[0]
    alpha_ref = 1.0 + row.n_tail / sum(
        np.log(d / 1.5) for d in planted if d >= 2
    )
    assert row.alpha == _pt.approx(alpha_ref, abs=1e-9)


def test_pagerank_stream_matches_batch(spark, tmp_path):
    """Warm-start PageRank maintenance over an edge stream: after
    draining, the maintained ranks equal a cold-start converged
    pagerank_classic on the DISTINCT union of all batches (duplicate
    edges across crawls must not inflate out-degrees)."""
    import os
    import time

    from incubator_hugegraph_computer_spark.operators.pagerank import (
        pagerank_classic,
    )
    from incubator_hugegraph_computer_spark.streaming.graph_ingest import (
        read_ranks,
        run_pagerank_stream,
    )

    edges = [(i % 25, (i * 13 + 5) % 25) for i in range(75)]
    edges = [(s, d) for s, d in edges if s != d]
    # chunk 2 re-delivers chunk 0's first ten edges: dedup semantics
    chunks = [edges[0:25], edges[25:50], edges[50:] + edges[0:10]]
    src = tmp_path / "edges"
    src.mkdir()
    for chunk, part in enumerate(chunks):
        df = spark.createDataFrame(part, "src long, dst long").coalesce(1)
        pdir = str(src / f"chunk{chunk}.parquet")
        df.write.mode("overwrite").parquet(pdir + ".tmp")
        fname = [f for f in os.listdir(pdir + ".tmp") if f.endswith(".parquet")][0]
        dest = str(src / f"part-{chunk:05d}.parquet")
        os.rename(os.path.join(pdir + ".tmp", fname), dest)
        ts = time.time() + chunk
        os.utime(dest, (ts, ts))

    run_pagerank_stream(
        spark,
        str(src),
        str(tmp_path / "ck"),
        str(tmp_path / "ranks"),
        str(tmp_path / "acc_edges"),
        tol=1e-10,
        max_files_per_trigger=1,
    )
    streamed = {
        r["id"]: r["rank"] for r in read_ranks(spark, str(tmp_path / "ranks")).collect()
    }
    dedup = sorted(set(edges))
    cold = {
        r["id"]: r["rank"]
        for r in pagerank_classic(
            make_graph(spark, dedup), max_iterations=200, tol=1e-10, count_messages=False
        ).collect()
    }
    assert set(streamed) == set(cold)
    for vid, rank in cold.items():
        assert streamed[vid] == pytest.approx(rank, abs=1e-6)


def test_global_efficiency_path(spark):
    from conftest import make_graph
    from incubator_hugegraph_computer_spark.operators.harmonic import (
        global_efficiency,
    )

    # directed path 0->1->2: sum of 1/d over ordered reachable pairs =
    # (1 + 1/2) + 1 = 2.5 ; E = 2.5 / (3 * 2)
    g = make_graph(spark, [(0, 1), (1, 2)], vertex_ids=range(3))
    row = global_efficiency(g).collect()[0]
    assert row["n_sources"] == 3 and row["n_vertices"] == 3
    assert abs(row["efficiency"] - 2.5 / 6) < 1e-6


def test_eccentricity_path(spark):
    from conftest import make_graph
    from incubator_hugegraph_computer_spark.operators.bfs import eccentricity

    g = make_graph(spark, [(0, 1), (1, 2), (2, 3)], vertex_ids=range(4))
    out = {r["id"]: (r["ecc"], r["n_reached"]) for r in eccentricity(g).collect()}
    assert out == {0: (3, 3), 1: (2, 2), 2: (1, 1), 3: (0, 0)}
