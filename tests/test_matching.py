"""Luby-style maximal matching — validity and maximality invariants."""

from conftest import make_graph

from incubator_hugegraph_computer_spark.operators.matching import maximal_matching

EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0),  # 6-cycle
    (0, 3), (1, 4),                                   # chords
    (6, 7),                                           # isolated pair
]


def _check(rows):
    matched = [(r["a"], r["b"]) for r in rows if r["matched"]]
    unmatched = [(r["a"], r["b"]) for r in rows if not r["matched"]]
    # validity: no two matched edges share an endpoint
    seen = set()
    for a, b in matched:
        assert a not in seen and b not in seen, (a, b)
        seen.update((a, b))
    # maximality: every unmatched edge touches a matched endpoint
    for a, b in unmatched:
        assert a in seen or b in seen, (a, b)
    return matched


def test_matching_valid_and_maximal(spark):
    g = make_graph(spark, EDGES, vertex_ids=range(8))
    rows = maximal_matching(g).collect()
    assert len(rows) == len(EDGES)
    matched = _check(rows)
    # the isolated pair can only be matched by itself — and maximality
    # forces it in
    assert (6, 7) in matched


def test_matching_deterministic(spark):
    g = make_graph(spark, EDGES, vertex_ids=range(8))
    a = sorted(map(tuple, maximal_matching(g, seed=7).collect()))
    b = sorted(map(tuple, maximal_matching(g, seed=7).collect()))
    assert a == b


def test_matching_single_edge(spark):
    g = make_graph(spark, [(0, 1)], vertex_ids=range(2))
    rows = maximal_matching(g).collect()
    assert len(rows) == 1 and rows[0]["matched"]


def test_coarsen_contracts_pairs(spark):
    from incubator_hugegraph_computer_spark.operators.matching import (
        coarsen,
        maximal_matching,
    )

    g = make_graph(spark, EDGES, vertex_ids=range(8))
    pairs = [
        (r["a"], r["b"])
        for r in maximal_matching(g).collect()
        if r["matched"]
    ]
    coarse = coarsen(g).collect()
    n_matched = len(pairs)
    # vertex count shrinks by exactly the number of matched pairs
    super_ids = {r["i"] for r in coarse} | {r["j"] for r in coarse}
    # supervertex of a matched pair is its min id; no pair's max id survives
    maxes = {max(a, b) for a, b in pairs}
    assert super_ids.isdisjoint(maxes)
    # edge weights conserve the original inter-super edge multiset
    assert sum(r["w"] for r in coarse) == len(EDGES) - n_matched
    # canonical, loop-free
    assert all(r["i"] < r["j"] for r in coarse)


def test_lsh_recall_report(spark):
    from incubator_hugegraph_computer_spark.functions.dedup import lsh_recall_report

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog again and again"),
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "a completely different document about spark shuffles and joins"),
            (3, "spark shuffles and joins are a completely different topic here"),
        ],
        "doc_id long, text string",
    )
    r = lsh_recall_report(docs, num_hashes=16, bands=4, n=3).collect()[0]
    # identical docs are always truth AND candidates (all bands equal)
    assert r["n_true"] >= 1 and r["n_hits"] >= 1
    assert r["n_hits"] <= r["n_true"] and r["n_hits"] <= r["n_candidates"]
    assert abs(r["recall"] - r["n_hits"] / r["n_true"]) < 1e-9
    # the exact-dup pair is caught
    assert r["recall"] > 0


def test_partition_stats_custom_assignment(spark):
    from pyspark.sql import functions as F

    from incubator_hugegraph_computer_spark.operators.stats import partition_stats

    # 0,1,2 in partition 0; 3,4,5 in partition 1; edges: 2 internal to
    # p0, 1 internal to p1, 2 crossing from p0
    g = make_graph(spark, [(0, 1), (1, 2), (3, 4), (0, 3), (2, 5)], vertex_ids=range(6))
    asg = g.vertices.select("id", (F.col("id") >= 3).cast("long").alias("pid"))
    out = {r["pid"]: r for r in partition_stats(g, assignment=asg).collect()}
    assert out[0]["n_vertices"] == 3 and out[1]["n_vertices"] == 3
    assert out[0]["internal_edges"] == 2 and out[0]["cut_edges"] == 2
    assert out[1]["internal_edges"] == 1 and out[1]["cut_edges"] == 0


def test_heavy_edge_matching_prefers_weight(spark):
    from pyspark.sql import functions as F

    from incubator_hugegraph_computer_spark.operators.matching import (
        heavy_edge_matching,
    )

    # star: center 0 with leaves 1..4; weights 1,2,3,9 — the heavy rule
    # must match 0-4 (weight 9), leaving the light spokes unmatched
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (0, 2, 2.0), (0, 3, 3.0), (0, 4, 9.0)],
        "src long, dst long, w double",
    )
    from incubator_hugegraph_computer_spark.graph import Graph

    g = Graph(
        edges.select("src").withColumnRenamed("src", "id").unionAll(
            edges.select(F.col("dst").alias("id"))
        ).distinct(),
        edges,
        num_partitions=4,
    )
    out = {(r["a"], r["b"]): r for r in heavy_edge_matching(g, weight_col="w").collect()}
    assert out[(0, 4)]["matched"]
    assert not any(r["matched"] for e, r in out.items() if e != (0, 4))


def test_heavy_edge_matching_validity(spark):
    from incubator_hugegraph_computer_spark.operators.matching import (
        heavy_edge_matching,
    )

    g = make_graph(spark, EDGES, vertex_ids=range(8))
    rows = heavy_edge_matching(g).collect()  # uniform weights
    _check(
        [
            {"a": r["a"], "b": r["b"], "matched": r["matched"]}
            for r in rows
        ]
    )
