"""Combiner library + SLPA + degree sketch tests."""

from pyspark.sql import functions as F

from incubator_hugegraph_computer_spark.functions import combiners as C
from incubator_hugegraph_computer_spark.graph import Graph
from incubator_hugegraph_computer_spark.operators.slpa import slpa
from incubator_hugegraph_computer_spark.operators.stats import degree_sketch


def _msgs(spark):
    rows = [
        (1, 5.0, "b", [10, 11], {"k1": "v1", "shared": "first"}),
        (1, 3.0, "aa", [11, 12], {"k2": "v2", "shared": "second"}),
        (2, 1.0, "c", [20], {"k3": "v3"}),
    ]
    return spark.createDataFrame(
        rows, "dst long, val double, sid string, ids array<long>, props map<string,string>"
    )


def test_combiner_library(spark):
    m = _msgs(spark)
    got = {
        r["dst"]: r
        for r in m.groupBy("dst")
        .agg(
            C.sum("val").alias("s"),
            C.vmin("val").alias("mn"),
            C.vmax("val").alias("mx"),
            C.vmin("sid", string_ids=True).alias("sid_min"),
            C.vmax("sid", string_ids=True).alias("sid_max"),
            C.id_list_merge("ids").alias("merged"),
            C.id_set_merge("ids").alias("unioned"),
        )
        .collect()
    }
    r1 = got[1]
    assert r1["s"] == 8.0 and r1["mn"] == 3.0 and r1["mx"] == 5.0
    # BytesUtil.compare semantics: length first — "b" < "aa"
    assert r1["sid_min"] == "b" and r1["sid_max"] == "aa"
    assert sorted(r1["merged"]) == [10, 11, 11, 12]
    assert sorted(r1["unioned"]) == [10, 11, 12]


def test_property_merge_combiners(spark):
    m = _msgs(spark).where(F.col("dst") == 1)
    old = m.orderBy("val").groupBy("dst").agg(C.merge_old_properties("props").alias("p")).first()["p"]
    new = m.orderBy("val").groupBy("dst").agg(C.merge_new_properties("props").alias("p")).first()["p"]
    assert set(old) == {"k1", "k2", "shared"} == set(new)
    # both values of `shared` are kept by exactly one policy each
    assert {old["shared"], new["shared"]} == {"first", "second"}


def _ring_graph(spark):
    # two triangles sharing vertex 3 → 3 is an overlap candidate
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3)], "src long, dst long"
    )
    return Graph.from_edges(edges, num_partitions=4)


def test_slpa_overlap_and_determinism(spark):
    g = _ring_graph(spark)
    out = slpa(g, rounds=8, threshold=0.2, seed=7)
    rows = {(r["id"], r["label"]) for r in out.collect()}
    # every vertex keeps at least one community label
    assert {i for i, _ in rows} == {1, 2, 3, 4, 5}
    again = {(r["id"], r["label"]) for r in slpa(g, rounds=8, threshold=0.2, seed=7).collect()}
    assert rows == again


def test_degree_sketch(spark):
    g = _ring_graph(spark)
    r = degree_sketch(g).first()
    assert r["n_edges"] == 6
    assert r["max_degree"] == 4  # vertex 3: 2 in + 2 out
    assert abs(r["avg_degree"] - 12 / 5) < 1e-6
