from conftest import make_graph

from incubator_hugegraph_computer_spark.operators.embeddings import node2vec_embeddings

EDGES = [
    (0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3), (1, 4),
    (5, 0), (4, 2),
]


def test_embeddings_schema_and_coverage(spark):
    g = make_graph(spark, EDGES, vertex_ids=range(6))
    emb = node2vec_embeddings(g, dim=8, walk_length=6, walks_per_node=2, seed=7)
    rows = emb.collect()
    assert emb.columns == ["id", "embedding"]
    assert [f.dataType.simpleString() for f in emb.schema.fields] == [
        "bigint",
        "array<double>",
    ]
    assert all(len(r["embedding"]) == 8 for r in rows)
    # every vertex has out-edges here, so every vertex walks and lands
    # in the vocabulary
    assert {r["id"] for r in rows} == set(range(6))


def test_embeddings_deterministic(spark):
    g = make_graph(spark, EDGES, vertex_ids=range(6))
    a = {
        r["id"]: tuple(r["embedding"])
        for r in node2vec_embeddings(g, dim=4, walk_length=5, seed=11).collect()
    }
    b = {
        r["id"]: tuple(r["embedding"])
        for r in node2vec_embeddings(g, dim=4, walk_length=5, seed=11).collect()
    }
    assert a == b
