"""Phash recall report, shared CDC spans, triangle null model."""

from conftest import make_graph

from incubator_hugegraph_computer_spark.functions.multimodal import (
    media_from_documents,
    phash_recall_report,
)
from incubator_hugegraph_computer_spark.functions.text import cdc_chunks
from incubator_hugegraph_computer_spark.operators.motifs import triangle_null_model

from pyspark.sql import functions as F


def test_phash_recall_consistency(spark):
    base = "shared boilerplate header across mirrored pages " * 3
    docs = spark.createDataFrame(
        [(i, base) for i in range(1, 4)]
        + [(9, "totally different content " * 6)],
        "doc_id long, text string",
    )
    row = phash_recall_report(media_from_documents(docs), max_hamming=4).collect()[0]
    # identical docs -> hamming 0 pairs, always recalled by pigeonhole
    assert row["n_true"] >= 3
    assert row["n_hits"] == row["n_true"]
    assert row["recall"] == 1.0
    assert row["n_candidates"] >= row["n_hits"]


def test_cdc_shared_spans(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta " * 3
    docs = spark.createDataFrame(
        [
            (1, "intro one " + shared),
            (2, "different opening text here " + shared),
            (3, "unrelated document body entirely " * 4),
        ],
        "doc_id long, text string",
    )
    ch = cdc_chunks(docs, window=8)
    sharedrows = (
        ch.groupBy("chunk_md5")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") >= 2)
        .collect()
    )
    # the common suffix must produce at least one chunk shared by 1 and 2
    assert len(sharedrows) >= 1


def test_triangle_null_model_formula(spark):
    # K4: n=4, every deg 3, m=6, T_obs=4; s2 = 4*3*2 = 24, m2 = 12
    g = make_graph(spark, [(a, b) for a in range(1, 5) for b in range(a + 1, 5)])
    row = triangle_null_model(g).collect()[0]
    assert row["n_vertices"] == 4 and row["n_edges"] == 6
    assert row["triangles_obs"] == 4
    exp = (24.0 ** 3) / (6.0 * 12.0 ** 3)
    assert abs(row["triangles_cfg_exp"] - round(exp, 6)) < 1e-9
    assert abs(row["clustering_excess"] - round(4 / exp, 6)) < 1e-9
