"""Macro-structure operators: embeddedness/local bridges, rich club,
bow-tie decomposition, SCAN structural clustering."""

import numpy as np
import pytest

from tests.conftest import make_graph


# ------------------------------------------------------------ embeddedness
def test_embeddedness_triangle_plus_bridge(spark):
    from incubator_hugegraph_computer_spark.operators.structure import (
        edge_embeddedness,
        local_bridges,
    )

    g = make_graph(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
    out = {(r.a, r.b): r.embeddedness for r in edge_embeddedness(g).collect()}
    assert out == {(0, 1): 1, (0, 2): 1, (1, 2): 1, (2, 3): 0}
    assert [(r.a, r.b) for r in local_bridges(g).collect()] == [(2, 3)]


def test_embeddedness_matches_bruteforce(spark):
    from incubator_hugegraph_computer_spark.operators.structure import (
        edge_embeddedness,
    )

    rng = np.random.RandomState(7)
    n = 25
    edges = sorted({(int(a), int(b)) for a, b in rng.randint(0, n, (120, 2)) if a != b})
    und = {(min(a, b), max(a, b)) for a, b in edges}
    adj = {v: set() for v in range(n)}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    expected = {(a, b): len(adj[a] & adj[b]) for a, b in und}
    g = make_graph(spark, edges)
    out = {(r.a, r.b): r.embeddedness for r in edge_embeddedness(g).collect()}
    assert out == expected


# ------------------------------------------------------------ rich club
def test_rich_club_clique_plus_pendants(spark):
    from incubator_hugegraph_computer_spark.operators.structure import rich_club

    # K4 on {0,1,2,3} plus pendants 4,5 on vertex 0:
    # deg = {0:5, 1:3, 2:3, 3:3, 4:1, 5:1}
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (0, 4), (0, 5)]
    g = make_graph(spark, edges)
    rows = {r.k: r for r in rich_club(g, max_k=5).collect()}
    assert rows[1].n_nodes == 4 and rows[1].n_edges == 6 and rows[1].phi == 1.0
    assert rows[2].n_nodes == 4 and rows[2].phi == 1.0
    assert rows[3].n_nodes == 1 and rows[3].n_edges == 0 and rows[3].phi is None
    assert rows[5].n_nodes == 0 and rows[5].phi is None


def test_rich_club_matches_bruteforce(spark):
    from incubator_hugegraph_computer_spark.operators.structure import rich_club

    rng = np.random.RandomState(11)
    n = 30
    edges = sorted({(int(a), int(b)) for a, b in rng.randint(0, n, (200, 2)) if a != b})
    und = {(min(a, b), max(a, b)) for a, b in edges}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    g = make_graph(spark, edges)
    for r in rich_club(g, max_k=8).collect():
        nodes = {v for v, d in deg.items() if d > r.k}
        e_k = sum(1 for a, b in und if a in nodes and b in nodes)
        assert r.n_nodes == len(nodes)
        assert r.n_edges == e_k
        if len(nodes) >= 2:
            assert r.phi == pytest.approx(
                2.0 * e_k / (len(nodes) * (len(nodes) - 1)), abs=1e-6
            )
        else:
            assert r.phi is None


# ------------------------------------------------------------ bow-tie
def test_bowtie_all_regions(spark):
    from incubator_hugegraph_computer_spark.operators.structure import bowtie

    # CORE = 3-cycle {1,2,3}; 0 = IN; 4 = OUT; 5 = TUBE (0→5→4);
    # 6 = TENDRIL_IN (0→6); 7 = TENDRIL_OUT (7→4);
    # 8↔9 = 2-cycle SCC, smaller than CORE, unreachable = DISCONNECTED;
    # 10 isolated = DISCONNECTED.
    edges = [
        (1, 2), (2, 3), (3, 1),
        (0, 1), (3, 4),
        (0, 5), (5, 4),
        (0, 6), (7, 4),
        (8, 9), (9, 8),
    ]
    g = make_graph(spark, edges, vertex_ids=range(11))
    out = {r.id: r.region for r in bowtie(g).collect()}
    assert out == {
        0: "IN", 1: "CORE", 2: "CORE", 3: "CORE", 4: "OUT",
        5: "TUBE", 6: "TENDRIL_IN", 7: "TENDRIL_OUT",
        8: "DISCONNECTED", 9: "DISCONNECTED", 10: "DISCONNECTED",
    }


def test_bowtie_core_tiebreak_min_scc_id(spark):
    from incubator_hugegraph_computer_spark.operators.structure import bowtie

    # two disjoint 2-cycles: equal-size SCCs → CORE is the min-id one
    edges = [(0, 1), (1, 0), (5, 6), (6, 5)]
    g = make_graph(spark, edges)
    out = {r.id: r.region for r in bowtie(g).collect()}
    assert out == {0: "CORE", 1: "CORE", 5: "DISCONNECTED", 6: "DISCONNECTED"}


# ------------------------------------------------------------ SCAN
def test_scan_two_k4_hub_outlier(spark):
    from incubator_hugegraph_computer_spark.operators.scan import scan

    # two K4 clusters joined by hub 8; pendant 9 is an outlier.
    # At eps=0.7 the eps-edges are exactly the K4-internal edges
    # (sigma 1.0 / 0.816 inside, 0.47-0.58 on the 8/9 spokes).
    edges = [
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
        (4, 5), (4, 6), (4, 7), (5, 6), (5, 7), (6, 7),
        (0, 8), (8, 4), (0, 9),
    ]
    g = make_graph(spark, edges)
    out = {r.id: r.label for r in scan(g, eps=0.7, mu=3).collect()}
    assert out == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4, 6: 4, 7: 4, 8: -1, 9: -2}


def test_scan_border_joins_min_cluster(spark):
    from incubator_hugegraph_computer_spark.operators.scan import scan

    # triangle core {0,1,2}; vertex 3 hangs off 1 and 2 (eps-similar to
    # both at low eps but not core at mu=3 since its eps-degree is 2+1)
    edges = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
    g = make_graph(spark, edges)
    # sigma(1,3): N[1]={0,1,2,3}, N[3]={1,2,3} -> |∩|=3, 3/sqrt(12)=0.866
    # so 3 is eps-adjacent to cores 1 and 2 at eps=0.8, but its own
    # eps-neighborhood is {3,1,2} = 3 >= mu → actually a core too; use
    # mu=4 to force border status.
    out = {r.id: r.label for r in scan(g, eps=0.8, mu=4).collect()}
    # cores: 0,1,2 (eps-neighborhood {self,other two core mates,3?}..)
    # 0: sigma(0,1)=sigma(0,2)=|{0,1,2}∪..|: N[0]={0,1,2}, N[1]={0,1,2,3}
    #    -> 3/sqrt(12)=0.866 ≥ 0.8; eps-nbhd(0) = {0,1,2} size 3 < mu=4
    # 1: eps edges to 0,2,3 → size 4 = core; same for 2.
    # components over core eps-edges: {1,2} → label 1.
    # borders: 0 (eps-adj to 1,2) → 1; 3 (eps-adj to 1,2) → 1.
    assert out == {0: 1, 1: 1, 2: 1, 3: 1}


def test_scan_no_cores_all_outliers_or_hubs(spark):
    from incubator_hugegraph_computer_spark.operators.scan import scan

    edges = [(0, 1), (2, 3)]
    g = make_graph(spark, edges)
    out = {r.id: r.label for r in scan(g, eps=0.99, mu=3).collect()}
    assert out == {0: -2, 1: -2, 2: -2, 3: -2}


def test_attack_tolerance_star(spark):
    from conftest import make_graph
    from incubator_hugegraph_computer_spark.operators.structure import (
        attack_tolerance,
    )

    # star: hub 0 with 6 leaves; removing the hub shatters the graph
    g = make_graph(spark, [(0, i) for i in range(1, 7)], vertex_ids=range(7))
    out = {r["k"]: (r["n_components"], r["giant_size"])
           for r in attack_tolerance(g, ks=(0, 1)).collect()}
    assert out[0] == (1, 7)
    assert out[1] == (6, 1)
