"""HyperBall harmonic centrality and bond percolation."""

import hashlib

from conftest import make_graph

from incubator_hugegraph_computer_spark.operators.neighborhood import (
    hyperball_harmonic,
)
from incubator_hugegraph_computer_spark.operators.structure import bond_percolation

EDGES = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (2, 6), (6, 1)]


def _regs(verts, succ, hops, m=16):
    regs = {}
    for v in verts:
        hx = hashlib.md5(f"{v}:anf".encode()).hexdigest()
        j = int(hx[:2], 16) % m
        xv = int(hx[2:10], 16)
        rho = 33 if xv == 0 else 33 - len(bin(xv)[2:])
        r = [0] * m
        r[j] = rho
        regs[v] = r
    yield regs
    for _ in range(hops):
        regs = {
            v: [
                max([regs[v][j]] + [regs[u][j] for u in succ.get(v, [])])
                for j in range(m)
            ]
            for v in verts
        }
        yield regs


def test_hyperball_harmonic_matches_python_replay(spark):
    hops, m = 3, 16
    g = make_graph(spark, EDGES)
    got = {r["id"]: r["harmonic_est"] for r in
           hyperball_harmonic(g, hops=hops, registers=m).collect()}
    verts = sorted({v for e in EDGES for v in e})
    succ = {}
    for s, d in EDGES:
        succ.setdefault(s, []).append(d)
    ests = []
    for regs in _regs(verts, succ, hops, m):
        ests.append(
            {v: 0.673 * m * m / sum(2.0 ** -r for r in regs[v]) for v in verts}
        )
    for v in verts:
        h = 0.0
        for k in range(1, hops + 1):
            h = h + (ests[k][v] - ests[k - 1][v]) / float(k)
        assert abs(got[v] - round(h, 6)) < 2e-6, (v, got[v], h)


def test_bond_percolation_levels_are_monotone(spark):
    g = make_graph(spark, EDGES + [(7, 8), (8, 9)], vertex_ids=range(1, 10))
    rows = {r["retain_hex"]: r for r in bond_percolation(g).collect()}
    # more retained edges -> fewer components, larger GCC (weakly)
    ks = ["40", "80", "c0"]
    kept = [rows[k]["kept_edges"] for k in ks]
    assert kept == sorted(kept)
    comps = [rows[k]["n_components"] for k in ks]
    assert comps == sorted(comps, reverse=True)
    gcc = [rows[k]["gcc_size"] for k in ks]
    assert gcc == sorted(gcc)
    # python replay of the md5 coins at the 50% level
    und = sorted({(min(a, b), max(a, b)) for a, b in g.edges.select("src", "dst").collect()})
    kept50 = [
        e
        for e in und
        if hashlib.md5(f"{e[0]}-{e[1]}:bp".encode()).hexdigest()[:2] < "80"
    ]
    assert rows["80"]["kept_edges"] == len(kept50)
