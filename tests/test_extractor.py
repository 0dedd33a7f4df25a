import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from incubator_hugegraph_computer_spark.sources.extractor import (
    build_catalog,
    extract_edges,
    verify_sha256,
)
from incubator_hugegraph_computer_spark.sources.repo_files import (
    expected_degrees_and_targets,
    generate_repo_files,
)

V = 200


@pytest.fixture(scope="module")
def files(spark):
    return generate_repo_files(spark, V, num_repos=4, seed=42).persist()


def test_generator_deterministic_and_complete(spark, files):
    assert files.count() == V
    assert files.select("path").distinct().count() == V
    # independent of partitioning
    again = generate_repo_files(spark, V, num_repos=4, seed=42, num_partitions=7)
    a = sorted(files.select("path", "content").collect())
    b = sorted(again.select("path", "content").collect())
    assert a == b


def test_sha256_matches_hashlib(spark, files):
    sample = files.limit(20).select("content", "sha256").collect()
    for r in sample:
        assert hashlib.sha256(r["content"].encode("utf-8")).hexdigest() == r["sha256"]


def test_sha256_verification_detects_corruption(spark, files):
    verify_sha256(files).count()  # clean table passes
    corrupted = files.withColumn(
        "content",
        F.when(F.col("file_idx") == 3, F.concat(F.col("content"), F.lit("X"))).otherwise(
            F.col("content")
        ),
    )
    with pytest.raises(ValueError, match="sha256 mismatch on 1 rows"):
        verify_sha256(corrupted).count()


def test_extracted_edges_match_closed_form(spark, files):
    """The pandas-UDF extraction recovers exactly the synthesized graph."""
    vertices, edges = extract_edges(files, verify=True)
    # map engine ids back to generator file_idx through the catalog module
    catalog = build_catalog(files)
    idx_of = {
        r["id"]: int(r["module"].split("_")[1]) for r in catalog.collect()
    }
    got = {(idx_of[r["src"]], idx_of[r["dst"]]) for r in edges.collect()}

    _, src, dst = expected_degrees_and_targets(np.arange(V), V, seed=42)
    want = {(int(s), int(d)) for s, d in zip(src, dst) if s != d}
    assert got == want
    assert vertices.count() == V


def test_catalog_dense_ids(spark, files):
    catalog = build_catalog(files, dense_ids=True)
    ids = [r["id"] for r in catalog.select("id").collect()]
    assert sorted(ids) == list(range(V))


def test_catalog_hash_ids_unique(spark, files):
    catalog = build_catalog(files, dense_ids=False)
    assert catalog.select("id").distinct().count() == V


def test_graph_has_power_law_structure(spark, files):
    """Sanity: hubs exist (salting has something to bite on) and some
    files are dangling."""
    _, edges = extract_edges(files, verify=False)
    outdeg = edges.groupBy("src").count()
    assert outdeg.agg(F.max("count")).first()[0] >= 10
    n_with_out = outdeg.count()
    assert n_with_out < V  # dangling files exist
