"""Property-graph ingest (EdgeFrequency + property combiners) and
output-sink parity tests."""

import json
import os

import pytest
from pyspark.sql import functions as F

from incubator_hugegraph_computer_spark.sources.property_graph import (
    PropertyGraph,
    load_edges,
    load_vertices,
)


def _edge_rows(spark):
    # duplicates across every identity granularity, with _seq arrival order
    rows = [
        # (src, dst, label, name, properties, seq)
        (1, 2, "knows", "a", {"w": "1", "x": "old"}, 1),
        (1, 2, "knows", "a", {"w": "2"}, 2),            # dup under all three keys
        (1, 2, "knows", "b", {"w": "3"}, 3),            # new under MULTIPLE only
        (1, 2, "likes", "a", {"w": "4"}, 4),            # new under SINGLE_PER_LABEL+
        (3, 4, "knows", "a", {"w": "5"}, 5),
    ]
    return spark.createDataFrame(
        rows,
        "src long, dst long, label string, name string, "
        "properties map<string,string>, seq long",
    )


def test_edge_frequency_dedup_counts(spark):
    e = _edge_rows(spark)
    # SINGLE: (1,2) + (3,4) = 2; SINGLE_PER_LABEL: (1,2,knows),(1,2,likes),(3,4,knows) = 3
    # MULTIPLE: (1,2,knows,a),(1,2,knows,b),(1,2,likes,a),(3,4,knows,a) = 4
    assert load_edges(e, "SINGLE").count() == 2
    assert load_edges(e, "SINGLE_PER_LABEL").count() == 3
    assert load_edges(e, "MULTIPLE").count() == 4
    with pytest.raises(ValueError):
        load_edges(e, "BOGUS")
    with pytest.raises(ValueError):
        load_edges(e.drop("name"), "MULTIPLE")


def test_property_combiners_on_ingest(spark):
    e = _edge_rows(spark).where((F.col("src") == 1) & (F.col("label") == "knows"))
    # MergeNewPropertiesCombiner: later keys win (seq order)
    new = load_edges(e, "SINGLE", "merge_new", seq_col="seq").first()["properties"]
    assert new == {"w": "3", "x": "old"}
    # MergeOldPropertiesCombiner: first-seen keys win
    old = load_edges(e, "SINGLE", "merge_old", seq_col="seq").first()["properties"]
    assert old == {"w": "1", "x": "old"}
    # OverwritePropertiesCombiner + seq: keeps the LAST-arrived whole map
    # (deterministic, not an arbitrary F.first over the group)
    ow = load_edges(e, "SINGLE", "overwrite", seq_col="seq").first()["properties"]
    assert ow == {"w": "3"}
    # without seq it still keeps exactly one whole map (arrival order
    # is partition-dependent, like the reference)
    ow2 = load_edges(e, "SINGLE", "overwrite").first()["properties"]
    assert ow2 in ({"w": "1", "x": "old"}, {"w": "2"}, {"w": "3"})


def test_property_ingest_edge_cases(spark):
    # non-string property values ingest (typed fold seed)
    e = spark.createDataFrame(
        [(1, 2, {"w": 1.5}, 1), (1, 2, {"w": 2.5, "z": 0.5}, 2)],
        "src long, dst long, properties map<string,double>, seq long",
    )
    got = load_edges(e, "SINGLE", "merge_new", seq_col="seq").first()["properties"]
    assert got == {"w": 2.5, "z": 0.5}

    # label-less SINGLE ingest: construction works and the audit
    # statistic reports one NULL-label row instead of failing analysis
    v = spark.createDataFrame([(1, "v", {})], "id long, label string, properties map<string,string>")
    pg = PropertyGraph(v, e.drop("seq"))
    counts = pg.edge_label_counts().collect()
    assert len(counts) == 1 and counts[0]["label"] is None and counts[0]["n_edges"] == 1

    # a typo'd seq_col (in neither input) raises instead of silently
    # demoting the merge to nondeterministic order
    with pytest.raises(ValueError, match="seq_col"):
        PropertyGraph(v, e.drop("seq"), seq_col="sqe")


def test_property_graph_as_graph_weighted(spark):
    verts = spark.createDataFrame(
        [(1, "person", {"age": "3"}), (2, "person", {}), (3, "person", {}), (4, "person", {})],
        "id long, label string, properties map<string,string>",
    )
    pg = PropertyGraph(verts, _edge_rows(spark), frequency="SINGLE_PER_LABEL",
                       seq_col="seq", num_partitions=4)
    assert pg.vertices.count() == 4
    g = pg.as_graph(weight_property="w")
    got = {(r["src"], r["dst"]): r["weight"] for r in g.edges.collect()}
    # merge_new under (src,label,dst): knows(1,2) ends with w=3
    assert got[(1, 2)] in (3.0, 4.0)  # two labels → two (1,2) rows
    counts = {r["label"]: r["n_edges"] for r in pg.edge_label_counts().collect()}
    assert counts == {"knows": 2, "likes": 1}


def test_vertex_dedup(spark):
    verts = spark.createDataFrame(
        [(1, "b", {"k": "1"}, 1), (1, "a", {"k": "2", "j": "x"}, 2), (2, "c", {}, 3)],
        "id long, label string, properties map<string,string>, seq long",
    )
    out = {r["id"]: (r["label"], r["properties"])
           for r in load_vertices(verts, "merge_new", seq_col="seq").collect()}
    assert out[1] == ("a", {"k": "2", "j": "x"})
    assert out[2] == ("c", {})


def test_sinks_roundtrip(spark, tmp_path):
    from incubator_hugegraph_computer_spark.sinks import (
        write_csv_struct,
        write_hdfs_text,
        write_json_struct,
    )

    res = spark.createDataFrame(
        [(1, 0.5, [1, 2]), (2, 1.5, [2]), (3, 2.5, [])],
        "id long, value double, path array<long>",
    )

    # HdfsOutput text: id<delim>value lines, merge=True -> single file
    p = str(tmp_path / "txt")
    write_hdfs_text(res.select("id", "value"), p, delimiter="\t", merge=True)
    files = [f for f in os.listdir(p) if f.startswith("part-")]
    assert len(files) == 1
    lines = sorted(open(os.path.join(p, files[0])).read().splitlines())
    assert lines == ["1\t0.5", "2\t1.5", "3\t2.5"]

    # output filter hook
    p2 = str(tmp_path / "txt2")
    write_hdfs_text(res.select("id", "value"), p2, merge=True,
                    output_filter=F.col("value") > 1.0)
    f2 = [f for f in os.listdir(p2) if f.startswith("part-")][0]
    assert sorted(open(os.path.join(p2, f2)).read().splitlines()) == ["2,1.5", "3,2.5"]

    # CsvStructGraphOutput: nested columns JSON-encoded into cells
    p3 = str(tmp_path / "csv")
    write_csv_struct(res, p3)
    back = spark.read.option("header", True).csv(p3)
    rows = {r["id"]: (r["value"], r["path"]) for r in back.collect()}
    assert rows["1"] == ("0.5", "[1,2]")

    # JsonStructGraphOutput
    p4 = str(tmp_path / "json")
    write_json_struct(res, p4)
    objs = sorted(
        (json.loads(l) for f in os.listdir(p4) if f.startswith("part-")
         for l in open(os.path.join(p4, f))),
        key=lambda o: o["id"],
    )
    assert objs[0] == {"id": 1, "value": 0.5, "path": [1, 2]}
