"""Bucketed graph store: round-trip parity + shuffle-free plans."""

from pyspark.sql import functions as F

from incubator_hugegraph_computer_spark.graph import Graph
from incubator_hugegraph_computer_spark.operators.pagerank import pagerank
from incubator_hugegraph_computer_spark.sources.graph_store import (
    load_graph,
    save_graph,
)


def _make_graph(spark):
    e = spark.range(2000).select(
        (F.col("id") % 211).alias("src"), ((F.col("id") * 7) % 173).alias("dst")
    ).where("src != dst").distinct()
    return Graph.from_edges(e, num_partitions=8)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_round_trip_and_bucketed_plans(spark, tmp_path):
    g = _make_graph(spark)
    path = str(tmp_path / "gstore")
    save_graph(g, path, buckets=8)

    loaded = load_graph(spark, path)
    assert loaded.num_partitions == 8
    assert loaded.num_edges() == g.num_edges()
    assert loaded.num_vertices() == g.num_vertices()

    # out-degree agg over the bucketed scan: NO Exchange at all —
    # the scan itself satisfies HashPartitioning(src, 8)
    agg_plan = _plan(loaded.edges.groupBy("src").count())
    assert "Exchange" not in agg_plan
    assert "Bucketed: true" in agg_plan

    # state derived from the co-bucketed vertices table joins the edge
    # table with ZERO exchanges (both scans satisfy the distribution)
    state = loaded.vertices.select(F.col("id").alias("src"), F.lit(1.0).alias("msg"))
    join_plan = _plan(loaded.edges.join(state.hint("shuffle_hash"), "src"))
    assert join_plan.count("Exchange") == 0

    # the BSP message-pass shape with an ARBITRARY state source: only
    # the state side shuffles (one Exchange), never the edge table
    ext = spark.range(100).select(F.col("id").alias("src"), F.lit(1.0).alias("msg"))
    ext_plan = _plan(loaded.edges.join(ext.hint("shuffle_hash"), "src"))
    assert ext_plan.count("Exchange") == 1


def test_pagerank_parity_on_loaded_graph(spark, tmp_path):
    g = _make_graph(spark)
    path = str(tmp_path / "gstore2")
    save_graph(g, path)
    loaded = load_graph(spark, path)

    want = {r["id"]: round(r["rank"], 10) for r in pagerank(g, max_supersteps=5).collect()}
    got = {
        r["id"]: round(r["rank"], 10) for r in pagerank(loaded, max_supersteps=5).collect()
    }
    assert got == want


def test_save_preserves_extra_columns(spark, tmp_path):
    e = spark.createDataFrame(
        [(1, 2, 0.5), (2, 3, 1.5), (1, 3, 2.0)], "src long, dst long, weight double"
    )
    g = Graph.from_edges(e, num_partitions=4)
    path = str(tmp_path / "gstore3")
    save_graph(g, path, buckets=4)
    loaded = load_graph(spark, path)
    rows = {(r["src"], r["dst"], r["weight"]) for r in loaded.edges.collect()}
    assert rows == {(1, 2, 0.5), (2, 3, 1.5), (1, 3, 2.0)}
