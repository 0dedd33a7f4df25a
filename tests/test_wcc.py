from tests.conftest import PRWCC_EDGES, PRWCC_VERTEX_IDS, make_graph
from tests.oracles import random_graph, wcc_oracle

from incubator_hugegraph_computer_spark.operators.wcc import wcc


def _as_dict(df):
    return {r["id"]: r["comp"] for r in df.collect()}


def test_wcc_fixture(spark):
    g = make_graph(spark, PRWCC_EDGES, PRWCC_VERTEX_IDS)
    got = _as_dict(wcc(g))
    want = wcc_oracle(PRWCC_VERTEX_IDS, PRWCC_EDGES)
    assert got == want
    # isolated vertex is its own component; component id == min member
    assert got[20] == 20
    assert got[10] == 10 and got[13] == 10


def test_wcc_random(spark):
    edges = random_graph(80, 120, seed=11)
    ids = list(range(80))
    g = make_graph(spark, edges, vertex_ids=ids)
    assert _as_dict(wcc(g)) == wcc_oracle(ids, edges)


def test_wcc_chain_diameter(spark):
    """Long chain exercises many supersteps + frontier shrink."""
    edges = [(i, i + 1) for i in range(30)]
    ids = list(range(31))
    g = make_graph(spark, edges, vertex_ids=ids)
    got = _as_dict(wcc(g, max_supersteps=40))
    assert set(got.values()) == {0}
