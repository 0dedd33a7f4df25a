"""Link-analysis additions: HITS hubs/authorities, truncated Katz,
common-neighbor / Adamic-Adar link prediction, degree assortativity,
and the corpus top-terms report. HITS/Katz verify against NumPy
recurrences on the golden PRWCC graph; link prediction against a
hand-enumerated wedge fixture."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import PRWCC_EDGES, PRWCC_VERTEX_IDS, make_graph

from incubator_hugegraph_computer_spark.functions.text import top_terms
from incubator_hugegraph_computer_spark.operators.hits import hits
from incubator_hugegraph_computer_spark.operators.katz import katz
from incubator_hugegraph_computer_spark.operators.link_prediction import (
    degree_assortativity,
    link_prediction,
)


def _hits_numpy(ids, edges, iters):
    index = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    hub = np.ones(n)
    auth = np.zeros(n)
    for _ in range(iters):
        auth = np.zeros(n)
        for s, d in edges:
            auth[index[d]] += hub[index[s]]
        auth /= auth.sum() or 1.0
        hub = np.zeros(n)
        for s, d in edges:
            hub[index[s]] += auth[index[d]]
        hub /= hub.sum() or 1.0
    return auth, hub, index


def test_hits_matches_numpy(spark):
    g = make_graph(spark, PRWCC_EDGES, PRWCC_VERTEX_IDS)
    got = {r["id"]: (r["auth"], r["hub"]) for r in hits(g, iterations=3).collect()}
    auth, hub, index = _hits_numpy(sorted(PRWCC_VERTEX_IDS), PRWCC_EDGES, 3)
    assert set(got) == set(PRWCC_VERTEX_IDS)
    for v in PRWCC_VERTEX_IDS:
        assert got[v][0] == pytest.approx(auth[index[v]], abs=1e-12)
        assert got[v][1] == pytest.approx(hub[index[v]], abs=1e-12)


def test_hits_isolated_vertex_scores_zero(spark):
    g = make_graph(spark, PRWCC_EDGES, PRWCC_VERTEX_IDS)
    got = {r["id"]: (r["auth"], r["hub"]) for r in hits(g, iterations=2).collect()}
    assert got[20] == (0.0, 0.0)


def _katz_numpy(ids, edges, alpha, iters):
    index = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    y = np.ones(n)
    out = np.zeros(n)
    for _ in range(iters):
        nxt = np.zeros(n)
        for s, d in edges:
            nxt[index[d]] += y[index[s]]
        y = alpha * nxt
        out += y
    return out, index


def test_katz_matches_numpy(spark):
    g = make_graph(spark, PRWCC_EDGES, PRWCC_VERTEX_IDS)
    got = {r["id"]: r["katz"] for r in katz(g, alpha=0.25, iterations=4).collect()}
    exp, index = _katz_numpy(sorted(PRWCC_VERTEX_IDS), PRWCC_EDGES, 0.25, 4)
    for v in PRWCC_VERTEX_IDS:
        assert got[v] == pytest.approx(exp[index[v]], abs=1e-12)


# Path 1-2-3-4 plus chord (1,3): undirected wedges give known cn/aa.
LP_EDGES = [(1, 2), (2, 3), (3, 4), (1, 3)]


def test_link_prediction_hand_fixture(spark):
    g = make_graph(spark, LP_EDGES)
    got = {
        (r["src"], r["dst"]): (r["cn"], r["aa"])
        for r in link_prediction(g).collect()
    }
    # non-adjacent pairs sharing a neighbor: (1,4) via 3 (deg 3),
    # (2,4) via 3 (deg 3). (1,3),(2,3) etc. are edges -> excluded.
    assert set(got) == {(1, 4), (2, 4)}
    assert got[(1, 4)] == (1, pytest.approx(1 / math.log(3)))
    assert got[(2, 4)] == (1, pytest.approx(1 / math.log(3)))


def test_link_prediction_degree_cap_drops_hub_wedges(spark):
    g = make_graph(spark, LP_EDGES)
    # cap 2 excludes vertex 3 (sym degree 3) as intermediary; the only
    # sub-cap wedge center is 2 (deg 2), whose pair (1,3) is an edge.
    assert link_prediction(g, max_intermediary_degree=2).count() == 0


def test_link_prediction_topk_deterministic_order(spark):
    g = make_graph(spark, PRWCC_EDGES, PRWCC_VERTEX_IDS)
    rows = link_prediction(g, top_k=5).collect()
    keys = [(-r["cn"], r["src"], r["dst"]) for r in rows]
    assert keys == sorted(keys)
    assert len(rows) == 5


def test_degree_assortativity_matches_numpy(spark):
    g = make_graph(spark, PRWCC_EDGES, PRWCC_VERTEX_IDS)
    got = degree_assortativity(g).collect()[0]["assortativity"]
    sym = {(s, d) for s, d in PRWCC_EDGES if s != d}
    sym |= {(d, s) for s, d in sym}
    deg = {}
    for s, _ in sym:
        deg[s] = deg.get(s, 0) + 1
    xs = [deg[s] for s, d in sorted(sym)]
    ys = [deg[d] for s, d in sorted(sym)]
    assert got == pytest.approx(np.corrcoef(xs, ys)[0, 1], abs=1e-9)


def test_avg_neighbor_degree_matches_brute_force(spark):
    from incubator_hugegraph_computer_spark.operators.link_prediction import (
        avg_neighbor_degree,
    )

    g = make_graph(spark, PRWCC_EDGES, PRWCC_VERTEX_IDS)
    got = {r["k"]: r["knn"] for r in avg_neighbor_degree(g).collect()}
    sym = {(s, d) for s, d in PRWCC_EDGES if s != d}
    sym |= {(d, s) for s, d in sym}
    nbrs = {}
    for s, d in sym:
        nbrs.setdefault(s, set()).add(d)
    deg = {v: len(ns) for v, ns in nbrs.items()}
    annd = {v: sum(deg[u] for u in ns) / len(ns) for v, ns in nbrs.items()}
    expect = {}
    for v, k in deg.items():
        expect.setdefault(k, []).append(annd[v])
    expect = {k: sum(vs) / len(vs) for k, vs in expect.items()}
    assert set(got) == set(expect)
    for k in expect:
        assert got[k] == pytest.approx(expect[k], abs=1e-9)


def test_top_terms_counts_and_order(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "apple!  APPLE date"),
        ],
        "doc_id long, text string",
    )
    rows = top_terms(docs, k=3).collect()
    assert [(r["term"], r["tf"], r["df"]) for r in rows] == [
        ("apple", 4, 2),
        ("banana", 2, 2),
        ("cherry", 1, 1),  # ties with 'date' on tf, term ASC wins
    ]


def test_eigenvector_matches_numpy(spark):
    from incubator_hugegraph_computer_spark.operators.eigenvector import eigenvector

    g = make_graph(spark, PRWCC_EDGES, PRWCC_VERTEX_IDS)
    got = {r["id"]: r["x"] for r in eigenvector(g, iterations=3).collect()}
    ids = sorted(PRWCC_VERTEX_IDS)
    index = {v: i for i, v in enumerate(ids)}
    x = np.ones(len(ids))
    for _ in range(3):
        nxt = np.zeros(len(ids))
        for s, d in PRWCC_EDGES:
            nxt[index[d]] += x[index[s]]
        x = nxt / (nxt.sum() or 1.0)
    for v in PRWCC_VERTEX_IDS:
        assert got[v] == pytest.approx(x[index[v]], abs=1e-12)


# K4 on {1,2,3,4} plus a pendant triangle (4,5,6): the 4-truss is
# exactly the K4 (each K4 edge sits in 2 triangles; pendant-triangle
# edges sit in 1 and peel off, which then leaves K4 intact).
K4_PLUS_TRI = [
    (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
    (4, 5), (4, 6), (5, 6),
]


def test_ktruss_k4_fixture(spark):
    from incubator_hugegraph_computer_spark.operators.ktruss import ktruss

    g = make_graph(spark, K4_PLUS_TRI)
    got = {(r["a"], r["b"]): r["sup"] for r in ktruss(g, k=4).collect()}
    assert got == {(1, 2): 2, (1, 3): 2, (1, 4): 2, (2, 3): 2, (2, 4): 2, (3, 4): 2}


def test_ktruss_k3_keeps_all_triangle_edges(spark):
    from incubator_hugegraph_computer_spark.operators.ktruss import ktruss

    g = make_graph(spark, K4_PLUS_TRI + [(6, 7)])  # (6,7) in no triangle
    got = {(r["a"], r["b"]) for r in ktruss(g, k=3).collect()}
    assert got == {(a, b) for a, b in K4_PLUS_TRI}


def test_ktruss_empty_result(spark):
    from incubator_hugegraph_computer_spark.operators.ktruss import ktruss

    g = make_graph(spark, [(1, 2), (2, 3)])  # no triangles at all
    assert ktruss(g, k=4).count() == 0


def test_reciprocity_fixture(spark):
    from incubator_hugegraph_computer_spark.operators.link_prediction import reciprocity

    # 6 directed edges, reciprocal pairs: (1,2)/(2,1) and (3,4)/(4,3)
    g = make_graph(spark, [(1, 2), (2, 1), (3, 4), (4, 3), (1, 3), (2, 4)])
    row = reciprocity(g).collect()[0]
    assert (row["n_edges"], row["n_reciprocal"]) == (6, 4)
    assert row["reciprocity"] == pytest.approx(4 / 6)


def _coreness_py(edges):
    """Exact coreness by repeated peeling (tiny python oracle)."""
    adj = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    core = {v: 0 for v in adj}
    k = 1
    while adj:
        while True:
            drop = [v for v, nb in adj.items() if len(nb) < k]
            if not drop:
                break
            for v in drop:
                for u in adj[v]:
                    adj[u].discard(v)
                del adj[v]
            adj = {v: nb for v, nb in adj.items() if True}
        for v in adj:
            core[v] = k
        k += 1
    return core


def test_coreness_matches_python_peel(spark):
    from incubator_hugegraph_computer_spark.operators.coreness import coreness

    edges = K4_PLUS_TRI + [(6, 7)]
    g = make_graph(spark, edges)
    got = {r["id"]: r["coreness"] for r in coreness(g, k_max=8, rounds_per_k=10).collect()}
    assert got == _coreness_py(edges)


def test_coreness_isolated_vertex_is_zero(spark):
    from incubator_hugegraph_computer_spark.operators.coreness import coreness

    g = make_graph(spark, [(1, 2)], vertex_ids=[1, 2, 9])
    got = {r["id"]: r["coreness"] for r in coreness(g, k_max=4).collect()}
    assert got == {1: 1, 2: 1, 9: 0}


def test_unigram_logprob_hand_values(spark):
    from incubator_hugegraph_computer_spark.functions.text import unigram_logprob

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, "")],
        "doc_id long, text string",
    )
    # corpus: a:2 b:2 c:1, total 5
    rows = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}
    import math as m

    exp1 = (2 * m.log(2 / 5) + m.log(2 / 5)) / 3
    exp2 = (m.log(2 / 5) + m.log(1 / 5)) / 2
    assert rows[1]["n_tokens"] == 3 and rows[1]["avg_logprob"] == pytest.approx(exp1)
    assert rows[2]["n_tokens"] == 2 and rows[2]["avg_logprob"] == pytest.approx(exp2)
    assert rows[3]["n_tokens"] == 0 and rows[3]["avg_logprob"] is None


def test_bigram_logprob_hand_values(spark):
    from incubator_hugegraph_computer_spark.functions.text import bigram_logprob

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "b a c"), (3, "x"), (4, "")],
        "doc_id long, text string",
    )
    import math as m

    # bigrams: doc1 (a,b) (b,a) (a,b); doc2 (b,a) (a,c); doc3/4 none
    # cb: (a,b)=2 (b,a)=2 (a,c)=1 ; cw: a·=3 b·=2
    # unigrams: a=3 b=3 c=1 x=1, total=8
    lam = 0.75

    def p(cb, cw, tf):
        return lam * cb / cw + (1 - lam) * tf / 8

    exp1 = (2 * m.log(p(2, 3, 3)) + m.log(p(2, 2, 3))) / 3
    exp2 = (m.log(p(2, 2, 3)) + m.log(p(1, 3, 1))) / 2
    rows = {r["doc_id"]: r for r in bigram_logprob(docs, lam=lam).collect()}
    assert rows[1]["n_bigrams"] == 3 and rows[1]["avg_logprob"] == pytest.approx(exp1)
    assert rows[2]["n_bigrams"] == 2 and rows[2]["avg_logprob"] == pytest.approx(exp2)
    assert rows[3]["n_bigrams"] == 0 and rows[3]["avg_logprob"] is None
    assert rows[4]["n_bigrams"] == 0 and rows[4]["avg_logprob"] is None


def _salsa_numpy(ids, edges, iters):
    edges = sorted(set(edges))
    index = {v: i for i, v in enumerate(ids)}
    outdeg, indeg = {}, {}
    for s, d in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
        indeg[d] = indeg.get(d, 0) + 1
    n = len(ids)
    hub = np.ones(n)
    auth = np.zeros(n)
    for _ in range(iters):
        auth = np.zeros(n)
        for s, d in edges:
            auth[index[d]] += hub[index[s]] / outdeg[s]
        auth /= auth.sum() or 1.0
        hub = np.zeros(n)
        for s, d in edges:
            hub[index[s]] += auth[index[d]] / indeg[d]
        hub /= hub.sum() or 1.0
    return auth, hub, index


def test_salsa_matches_numpy(spark):
    from incubator_hugegraph_computer_spark.operators.salsa import salsa

    g = make_graph(spark, PRWCC_EDGES, PRWCC_VERTEX_IDS)
    got = {r["id"]: (r["auth"], r["hub"]) for r in salsa(g, iterations=3).collect()}
    auth, hub, index = _salsa_numpy(sorted(PRWCC_VERTEX_IDS), PRWCC_EDGES, 3)
    assert set(got) == set(PRWCC_VERTEX_IDS)
    for v in PRWCC_VERTEX_IDS:
        assert got[v][0] == pytest.approx(auth[index[v]], abs=1e-12)
        assert got[v][1] == pytest.approx(hub[index[v]], abs=1e-12)


def test_salsa_isolated_vertex_scores_zero(spark):
    from incubator_hugegraph_computer_spark.operators.salsa import salsa

    g = make_graph(spark, PRWCC_EDGES, PRWCC_VERTEX_IDS)
    got = {r["id"]: (r["auth"], r["hub"]) for r in salsa(g, iterations=2).collect()}
    assert got[20] == (0.0, 0.0)


def test_motif_census_hand_fixture(spark):
    from incubator_hugegraph_computer_spark.operators.motifs import motif_census

    # {1,2} mutual, {1,3} mutual, {2,3} asym; one cyclic triangle
    # (1->2->3->1) and three transitive embeddings; vertex 9 isolated.
    g = make_graph(
        spark, [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3)], vertex_ids=[1, 2, 3, 9]
    )
    row = motif_census(g).collect()[0]
    assert row["n_vertices"] == 4
    assert row["mutual_dyads"] == 2
    assert row["asym_dyads"] == 1
    assert row["null_dyads"] == 3  # 4*3/2 - 2 - 1
    assert row["cyclic_triangles"] == 1
    assert row["transitive_triangles"] == 3


def test_motif_census_no_triangles(spark):
    from incubator_hugegraph_computer_spark.operators.motifs import motif_census

    row = motif_census(make_graph(spark, [(1, 2), (2, 3)])).collect()[0]
    assert row["cyclic_triangles"] == 0
    assert row["transitive_triangles"] == 0
    assert row["mutual_dyads"] == 0
    assert row["asym_dyads"] == 2


def test_ego_size_chain(spark):
    from incubator_hugegraph_computer_spark.operators.bfs import ego_size

    g = make_graph(spark, [(1, 2), (2, 3), (3, 4)], vertex_ids=[1, 2, 3, 4, 9])
    got = {r["id"]: r["ego_size"] for r in ego_size(g, radius=2).collect()}
    assert got == {1: 2, 2: 2, 3: 1, 4: 0, 9: 0}


def test_ego_size_cycle_excludes_self(spark):
    from incubator_hugegraph_computer_spark.operators.bfs import ego_size

    # 1->2->3->1: every vertex reaches the other two in <=2 hops but
    # never counts itself (root==v excluded even when reachable).
    g = make_graph(spark, [(1, 2), (2, 3), (3, 1)])
    got = {r["id"]: r["ego_size"] for r in ego_size(g, radius=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_ego_size_radius_three(spark):
    from incubator_hugegraph_computer_spark.operators.bfs import ego_size

    g = make_graph(spark, [(1, 2), (2, 3), (3, 4)])
    got = {r["id"]: r["ego_size"] for r in ego_size(g, radius=3).collect()}
    assert got == {1: 3, 2: 2, 3: 1, 4: 0}


def test_cocitation_bibcoupling_fixture(spark):
    """Co-citation = common in-neighbors, bibliographic coupling =
    common out-neighbors — both as bipartite projections of the edge
    table. Edges 1->3, 1->4, 2->3, 2->4, 5->3: pages 3,4 are co-cited
    by {1,2}; sources pair as (1,2):{3,4}, (1,5):{3}, (2,5):{3}."""
    from pyspark.sql import functions as F

    from incubator_hugegraph_computer_spark.operators.projection import project

    edges = spark.createDataFrame(
        [(1, 3), (1, 4), (2, 3), (2, 4), (5, 3)], "src long, dst long"
    )
    cocit = {
        (r["src"], r["dst"]): r["weight"]
        for r in project(edges, "src", "dst").collect()
    }
    assert cocit == {(3, 4): 2}
    bibc = {
        (r["src"], r["dst"]): r["weight"]
        for r in project(edges, "dst", "src").collect()
    }
    assert bibc == {(1, 2): 2, (1, 5): 1, (2, 5): 1}
    # the hub cap drops the whole group, not just its excess pairs
    capped = project(edges, "dst", "src", max_group_size=2).collect()
    assert {(r["src"], r["dst"]): r["weight"] for r in capped} == {(1, 2): 1}
