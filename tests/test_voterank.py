"""VoteRank seed selection — hand-computed election fixture."""

from conftest import make_graph

from incubator_hugegraph_computer_spark.operators.voterank import voterank

# star 0-{1..5}  +  triangle {6,7,8}; 9 vertices, 16 sym edges → δ = 9/16
STAR = [(0, i) for i in range(1, 6)]
TRI = [(6, 7), (6, 8), (7, 8)]


def test_voterank_election_order(spark):
    g = make_graph(spark, STAR + TRI, vertex_ids=range(9))
    out = sorted(voterank(g, k=3).collect(), key=lambda r: r["sel_rank"])
    # round 1: hub 0 wins with 5 votes; its leaves drop to 1 - 9/16
    assert (out[0]["id"], out[0]["score"]) == (0, 5.0)
    # round 2: leaves now score 0 (their only neighbor stopped voting);
    # each triangle vertex scores 2 → lowest id 6 wins
    assert (out[1]["id"], out[1]["score"]) == (6, 2.0)
    # round 3: 7 and 8 each see one suppressed neighbor (1 - 0.5625)
    assert out[2]["id"] == 7
    assert abs(out[2]["score"] - 0.4375) < 1e-9


def test_voterank_exhausts_gracefully(spark):
    g = make_graph(spark, [(0, 1)], vertex_ids=range(2))
    out = voterank(g, k=5).collect()
    # only 2 vertices exist; elections keep returning rows (score 0
    # after both are elected is impossible — the candidate pool empties)
    assert len(out) == 2
    assert [r["sel_rank"] for r in sorted(out, key=lambda r: r["sel_rank"])] == [1, 2]
