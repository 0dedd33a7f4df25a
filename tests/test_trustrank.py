"""TrustRank / spam mass vs a literal NumPy power iteration."""

import numpy as np
import pytest

from tests.conftest import make_graph


def _np_trustrank(n, edges, seeds, iters, d=0.85):
    s = np.zeros(n)
    s[list(seeds)] = 1.0 / len(seeds)
    out = {v: [] for v in range(n)}
    for a, b in edges:
        if a != b:
            out[a].append(b)
    # edge dedup to mirror Graph's EdgeFrequency.SINGLE
    out = {v: sorted(set(ws)) for v, ws in out.items()}
    r = s.copy()
    for _ in range(iters):
        nxt = np.zeros(n)
        dang = 0.0
        for v in range(n):
            if out[v]:
                for w in out[v]:
                    nxt[w] += r[v] / len(out[v])
            else:
                dang += r[v]
        r = (1 - d) * s + d * (nxt + dang * s)
    return r


def test_trustrank_matches_numpy(spark):
    from incubator_hugegraph_computer_spark.operators.trustrank import trustrank

    rng = np.random.RandomState(17)
    n = 25
    edges = sorted({(int(a), int(b)) for a, b in rng.randint(0, n, (80, 2)) if a != b})
    seeds = [0, 1, 2]
    g = make_graph(spark, edges, vertex_ids=range(n))
    ref = _np_trustrank(n, edges, seeds, iters=8)
    out = {r.id: r.rank for r in trustrank(g, seeds, max_iterations=8, tol=0.0).collect()}
    for v in range(n):
        assert out[v] == pytest.approx(ref[v], abs=1e-9)


def test_trustrank_mass_concentrates_near_seeds(spark):
    from incubator_hugegraph_computer_spark.operators.trustrank import trustrank

    # chain 0→1→2→3→4: trust decays monotonically with distance from seed
    g = make_graph(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    out = {r.id: r.rank for r in trustrank(g, [0], max_iterations=20, tol=0.0).collect()}
    assert out[0] > out[1] > out[2] > out[3] > out[4] > 0


def test_spam_mass_flags_untrusted_cluster(spark):
    from incubator_hugegraph_computer_spark.operators.trustrank import spam_mass

    # trusted hub 0 links 1,2; spam farm 5,6,7 link each other (high PR,
    # zero trust inflow) — their spam mass must exceed the trusted side's
    edges = [(0, 1), (0, 2), (1, 0), (2, 0), (5, 6), (6, 7), (7, 5)]
    g = make_graph(spark, edges, vertex_ids=range(8))
    rows = {r.id: r for r in spam_mass(g, [0], max_iterations=15).collect()}
    for spam in (5, 6, 7):
        for good in (0, 1, 2):
            assert rows[spam].spam_mass > rows[good].spam_mass
    assert rows[5].trust == pytest.approx(0.0, abs=1e-12)
