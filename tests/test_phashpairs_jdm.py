"""Phash banded near-dup pairs and the joint degree matrix."""

from conftest import make_graph

from incubator_hugegraph_computer_spark.functions.multimodal import (
    media_from_documents,
    phash_near_duplicates,
)
from incubator_hugegraph_computer_spark.operators.stats import joint_degree_matrix


def test_phash_pairs_find_near_identical_media(spark):
    base = "the quick brown fox jumps over the lazy dog " * 4
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),                      # identical -> hamming 0
            (3, base[:-4] + "cats"),        # tail tweak -> small hamming
            (4, "zzz completely different content qqq " * 5),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["media_a"], r["media_b"]): r["hamming"]
        for r in phash_near_duplicates(
            media_from_documents(docs), max_hamming=10
        ).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 10
    assert not any(4 in p for p in pairs)


def test_joint_degree_matrix_star_plus_edge(spark):
    # star: hub 0 (deg 8) with 8 leaves (deg 1); plus edge 20-21
    g = make_graph(spark, [(0, i) for i in range(1, 9)] + [(20, 21)])
    rows = {(r["dlo"], r["dhi"]): r["n_edges"]
            for r in joint_degree_matrix(g).collect()}
    # hub deg 8 -> bucket 3; leaves deg 1 -> bucket 0; 20/21 deg 1 -> (0,0)
    assert rows[(0, 3)] == 8
    assert rows[(0, 0)] == 1
    assert sum(rows.values()) == 9
