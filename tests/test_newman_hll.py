"""Newman spectral vector and grouped portable-HLL distinct counts."""

import hashlib

from conftest import make_graph

from incubator_hugegraph_computer_spark.functions.sketches import hll_distinct
from incubator_hugegraph_computer_spark.operators.eigenvector import (
    newman_leading_vector,
)

# two triangles bridged by one edge — the classic 2-community graph
TWO_TRI = [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (3, 4)]


def test_newman_vector_matches_python_replay(spark):
    g = make_graph(spark, TWO_TRI)
    iters = 4
    got = {r["id"]: r["bscore"] for r in
           newman_leading_vector(g, iterations=iters).collect()}
    sym = {}
    for a, b in TWO_TRI:
        sym.setdefault(a, set()).add(b)
        sym.setdefault(b, set()).add(a)
    verts = sorted(sym)
    k = {v: len(sym[v]) for v in verts}
    m2 = float(sum(k.values()))

    def sign(v):
        h = hashlib.md5(f"{v}:nv".encode()).hexdigest()
        return 1.0 if int(h[:8], 16) % 2 == 0 else -1.0

    x = {v: sign(v) for v in verts}
    for _ in range(iters):
        av = {v: sum(x[u] for u in sym[v]) for v in verts}
        kv = sum(k[v] * x[v] for v in verts)
        bx = {v: av[v] - k[v] * kv / m2 for v in verts}
        n1 = sum(abs(b) for b in bx.values())
        x = {v: bx[v] / n1 for v in verts}
    for v in verts:
        assert abs(got[v] - round(x[v], 6)) < 2e-6, (v, got[v], x[v])
    # the sign pattern separates the two triangles (bridge ends may be
    # weak but the off-bridge corners must disagree across the cut)
    assert (got[1] > 0) == (got[2] > 0)
    assert (got[5] > 0) == (got[6] > 0)
    assert (got[1] > 0) != (got[5] > 0)


def test_hll_distinct_matches_register_replay(spark):
    rows = [(g, u) for g in ("a", "b") for u in range(1, 40, 2 if g == "a" else 3)]
    df = spark.createDataFrame(rows, "grp string, user_id long")
    got = {r["grp"]: r["est_distinct"]
           for r in hll_distinct(df, "user_id", ["grp"]).collect()}
    m = 16
    for grp in ("a", "b"):
        users = {u for g, u in rows if g == grp}
        regs = [0] * m
        for u in users:
            hx = hashlib.md5(f"{u}:hll".encode()).hexdigest()
            j = int(hx[:2], 16) % m
            xv = int(hx[2:10], 16)
            rho = 33 if xv == 0 else 33 - len(bin(xv)[2:])
            regs[j] = max(regs[j], rho)
        z = sum(2.0 ** -r for r in regs)
        assert abs(got[grp] - round(0.673 * m * m / z, 6)) < 2e-6
