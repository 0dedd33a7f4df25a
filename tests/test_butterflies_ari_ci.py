"""Butterfly census, clustering agreement, collective influence."""

import math

from conftest import make_graph

from incubator_hugegraph_computer_spark.operators.projection import butterfly_count
from incubator_hugegraph_computer_spark.operators.stats import clustering_agreement
from incubator_hugegraph_computer_spark.operators.structure import (
    collective_influence,
)


def test_butterfly_count_fixture(spark):
    # srcs 1,2 both point at dsts 10,11 -> exactly one butterfly;
    # src 3 shares only dst 10 with them -> two more wedge pairs
    g = make_graph(spark, [(1, 10), (1, 11), (2, 10), (2, 11), (3, 10)])
    row = butterfly_count(g).collect()[0]
    assert row["butterflies"] == 1
    assert row["wedge_pairs"] == 3  # (1,2) (1,3) (2,3)


def test_clustering_agreement_identical_and_python_replay(spark):
    ids = list(range(12))
    a = spark.createDataFrame([(i, i % 3) for i in ids], "id long, la long")
    same = spark.createDataFrame([(i, (i % 3) + 7) for i in ids], "id long, lb long")
    row = clustering_agreement(a, same).collect()[0]
    assert row["ari"] == 1.0 and row["nmi"] == 1.0

    b = spark.createDataFrame([(i, i % 2) for i in ids], "id long, lb long")
    got = clustering_agreement(a, b).collect()[0]
    # python replay of the pair-counting formulas
    la = {i: i % 3 for i in ids}
    lb = {i: i % 2 for i in ids}
    n = len(ids)
    cont = {}
    for i in ids:
        cont[(la[i], lb[i])] = cont.get((la[i], lb[i]), 0) + 1
    c2 = lambda x: x * (x - 1) // 2
    sij = sum(c2(v) for v in cont.values())
    ai = {}
    bj = {}
    for (x, y), v in cont.items():
        ai[x] = ai.get(x, 0) + v
        bj[y] = bj.get(y, 0) + v
    sa = sum(c2(v) for v in ai.values())
    sb = sum(c2(v) for v in bj.values())
    exp = sa * sb / c2(n)
    ari = (sij - exp) / ((sa + sb) / 2 - exp)
    mi = sum(
        (v / n) * math.log(n * v / (ai[x] * bj[y])) for (x, y), v in cont.items()
    )
    ha = -sum((v / n) * math.log(v / n) for v in ai.values())
    hb = -sum((v / n) * math.log(v / n) for v in bj.values())
    assert abs(got["ari"] - round(ari, 6)) < 2e-6
    assert abs(got["nmi"] - round(mi / math.sqrt(ha * hb), 6)) < 2e-6


def test_collective_influence_fixture(spark):
    # path 1-2-3-4-5: sym degrees 1,2,2,2,1
    g = make_graph(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    ci = {r["id"]: r["ci"] for r in collective_influence(g).collect()}
    # boundary at distance exactly 2: v=1 -> {3}: (1-1)*(2-1) = 0
    assert ci[1] == 0 and ci[5] == 0  # k-1 = 0 kills the ends
    # v=2 -> {4}: (2-1)*(2-1) = 1 ; v=3 -> {1,5}: (2-1)*((1-1)+(1-1)) = 0
    assert ci[2] == 1 and ci[4] == 1
    assert ci[3] == 0
