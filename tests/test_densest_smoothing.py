"""Densest-subgraph peel and feature smoothing against tiny
hand-checkable fixtures plus NumPy references."""

import numpy as np
import pytest

from conftest import make_graph

from incubator_hugegraph_computer_spark.operators.densest import densest_subgraph
from incubator_hugegraph_computer_spark.operators.smoothing import smooth_feature


# A 4-clique (0-3) with a pendant path 4-5-6 hanging off vertex 0: the
# densest subgraph is the clique (density 6/4 = 1.5); the full graph's
# density is 8/7 ≈ 1.14.
CLIQUE_PLUS_TAIL = [
    (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
    (0, 4), (4, 5), (5, 6),
]


def test_densest_finds_clique(spark):
    g = make_graph(spark, CLIQUE_PLUS_TAIL, vertex_ids=range(7))
    out = densest_subgraph(g, eps=0.1, max_rounds=8).collect()
    ids = sorted(r.id for r in out)
    assert ids == [0, 1, 2, 3]
    assert all(abs(r.density - 1.5) < 1e-9 for r in out)


def test_densest_peel_matches_reference_rule(spark):
    """Replay the Bahmani rule in plain python on a random graph and
    compare the chosen prefix exactly."""
    rng = np.random.RandomState(7)
    n = 40
    edges = {(int(a), int(b)) for a, b in rng.randint(0, n, size=(120, 2)) if a != b}
    g = make_graph(spark, sorted(edges), vertex_ids=range(n))

    und = {frozenset(e) for e in edges}
    verts = set(range(n))
    eps, best = 0.1, (-1.0, set())
    for _ in range(8):
        cur = {e for e in und if e <= verts}
        density = len(cur) / len(verts) if verts else 0.0
        if density > best[0]:
            best = (density, set(verts))
        if not verts:
            break
        deg = {v: 0 for v in verts}
        for e in cur:
            for v in e:
                deg[v] += 1
        thr = 2.0 * (1.0 + eps) * density
        verts = {v for v in verts if deg[v] > thr}

    out = densest_subgraph(g, eps=eps, max_rounds=8).collect()
    assert sorted(r.id for r in out) == sorted(best[1])
    assert all(abs(r.density - best[0]) < 1e-9 for r in out)


def test_densest_max_rounds_guard(spark):
    g = make_graph(spark, CLIQUE_PLUS_TAIL, vertex_ids=range(7))
    out = densest_subgraph(g, eps=0.1, max_rounds=0).collect()  # clamped to 1
    assert sorted(r.id for r in out) == list(range(7))


# Path 0-1-2 plus isolated vertex 3: one round of α=0.5 smoothing from
# x = [1, 0, 0, 5]:
#   x(0) = .5·1 + .5·mean(x1)       = 0.5
#   x(1) = .5·0 + .5·mean(x0,x2)    = 0.25
#   x(2) = .5·0 + .5·mean(x1)       = 0.0
#   x(3) keeps 5 (no neighbors)
PATH = [(0, 1), (1, 2)]


def test_smoothing_one_round_hand_checked(spark):
    g = make_graph(spark, PATH, vertex_ids=range(4))
    feats = spark.createDataFrame(
        [(0, 1.0), (1, 0.0), (2, 0.0), (3, 5.0)], "id long, x double"
    )
    out = {r.id: r.x for r in smooth_feature(g, feats, rounds=1, alpha=0.5).collect()}
    assert out == pytest.approx({0: 0.5, 1: 0.25, 2: 0.0, 3: 5.0})


def test_smoothing_matches_numpy_iteration(spark):
    rng = np.random.RandomState(11)
    n = 25
    edges = {(int(a), int(b)) for a, b in rng.randint(0, n, size=(60, 2)) if a != b}
    x = rng.uniform(-10, 10, size=n)
    g = make_graph(spark, sorted(edges), vertex_ids=range(n))
    feats = spark.createDataFrame(
        [(i, float(x[i])) for i in range(n)], "id long, x double"
    )

    und = {frozenset(e) for e in edges}
    nbrs = [[] for _ in range(n)]
    for e in und:
        a, b = sorted(e)
        nbrs[a].append(b)
        nbrs[b].append(a)
    ref = x.copy()
    for _ in range(3):
        nxt = ref.copy()
        for v in range(n):
            if nbrs[v]:
                nxt[v] = 0.5 * ref[v] + 0.5 * np.mean([ref[u] for u in nbrs[v]])
        ref = nxt

    out = {r.id: r.x for r in smooth_feature(g, feats, rounds=3, alpha=0.5).collect()}
    for v in range(n):
        assert out[v] == pytest.approx(ref[v], abs=1e-9)


def _newman_r(edge_list, attr):
    """Literal Newman eq. 2 over the symmetrized directed edge list."""
    sym = {(a, b) for a, b in edge_list if a != b} | {
        (b, a) for a, b in edge_list if a != b
    }
    m = len(sym)
    diag = sum(1 for a, b in sym if attr[a] == attr[b]) / m
    from collections import Counter

    cs, cd = Counter(attr[a] for a, _ in sym), Counter(attr[b] for _, b in sym)
    sab = sum(cs[i] * cd[i] for i in cs) / (m * m)
    return (diag - sab) / (1 - sab)


def test_attr_assortativity_two_camps(spark):
    """Two 3-cliques joined by one edge, camp labels: strongly
    assortative; python Newman reference parity."""
    from incubator_hugegraph_computer_spark.operators.link_prediction import (
        attribute_assortativity,
    )

    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    attr = {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1}
    g = make_graph(spark, edges, vertex_ids=range(6))
    attrs = spark.createDataFrame(sorted(attr.items()), "id long, attr long")
    out = attribute_assortativity(g, attrs).collect()[0].attr_assortativity
    assert out == pytest.approx(_newman_r(edges, attr), abs=1e-6)
    assert out > 0.5  # homophilous by construction


def test_attr_assortativity_random_labels_near_zero(spark):
    from incubator_hugegraph_computer_spark.operators.link_prediction import (
        attribute_assortativity,
    )

    rng = np.random.RandomState(3)
    n = 30
    edges = sorted({(int(a), int(b)) for a, b in rng.randint(0, n, (150, 2)) if a != b})
    attr = {v: int(rng.randint(0, 2)) for v in range(n)}
    g = make_graph(spark, edges, vertex_ids=range(n))
    attrs = spark.createDataFrame(sorted(attr.items()), "id long, attr long")
    out = attribute_assortativity(g, attrs).collect()[0].attr_assortativity
    assert out == pytest.approx(_newman_r(edges, attr), abs=1e-6)


def test_smoothing_missing_features_default_zero(spark):
    g = make_graph(spark, PATH, vertex_ids=range(3))
    feats = spark.createDataFrame([(0, 4.0)], "id long, x double")
    out = {r.id: r.x for r in smooth_feature(g, feats, rounds=0, alpha=0.5).collect()}
    assert out == {0: 4.0, 1: 0.0, 2: 0.0}
