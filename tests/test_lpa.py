from tests.conftest import LPA_EDGES, LPA_VERTEX_IDS, make_graph
from tests.oracles import lpa_java_oracle, lpa_sync_oracle, random_graph

from incubator_hugegraph_computer_spark.operators.lpa import lpa, lpa_sync


def _as_dict(df):
    return {r["id"]: r["label"] for r in df.collect()}


def test_lpa_reference_fixture_community_count(spark):
    """LpaTest.java:125-133 asserts exactly 4 communities on this graph."""
    g = make_graph(spark, LPA_EDGES, LPA_VERTEX_IDS)
    got = _as_dict(lpa(g, max_supersteps=10))
    assert len(set(got.values())) == 4
    # deterministic: exact per-vertex labels match the python oracle
    assert got == lpa_java_oracle(LPA_VERTEX_IDS, LPA_EDGES)


def test_lpa_random_matches_oracle(spark):
    edges = random_graph(40, 100, seed=3)
    ids = list(range(40))
    g = make_graph(spark, edges, vertex_ids=ids)
    assert _as_dict(lpa(g, max_supersteps=10)) == lpa_java_oracle(ids, edges, max_steps=10)


def test_lpa_sync_matches_vermeer_oracle(spark):
    edges = random_graph(40, 100, seed=3)
    ids = list(range(40))
    g = make_graph(spark, edges, vertex_ids=ids)
    assert _as_dict(lpa_sync(g, max_supersteps=10)) == lpa_sync_oracle(ids, edges, max_steps=10)


def test_lpa_isolated_keeps_label(spark):
    g = make_graph(spark, [(1, 2)], vertex_ids=[1, 2, 9])
    got = _as_dict(lpa(g))
    assert got[9] == 9


def test_lpa_stride_parity(spark):
    """stride mode = same per-round math, fewer barriers: labels must
    match the per-superstep schedule exactly, for strides that divide
    the round budget and ones that don't."""
    import pytest

    edges = random_graph(80, 400, seed=11)
    g = make_graph(spark, edges, range(80)).cache()
    base = {r["id"]: r["label"] for r in lpa(g, max_supersteps=10).collect()}
    for stride in (2, 3, 4):
        got = {
            r["id"]: r["label"]
            for r in lpa(g, max_supersteps=10, method="stride", stride=stride).collect()
        }
        assert got == base, stride
    with pytest.raises(ValueError):
        lpa(g, method="strde")
