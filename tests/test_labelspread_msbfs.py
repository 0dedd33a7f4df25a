"""Continuous label spreading and bit-parallel multi-source BFS."""

from conftest import make_graph

from incubator_hugegraph_computer_spark.operators.bfs import msbfs_reach
from incubator_hugegraph_computer_spark.operators.smoothing import label_spread


def test_label_spread_matches_python_replay(spark):
    edges = [(1, 2), (2, 3), (3, 4)]
    g = make_graph(spark, edges)
    seeds = spark.createDataFrame([(1, 0), (4, 1)], "id long, c long")
    got = {
        (r["id"], r["c"]): round(r["f"], 9)
        for r in label_spread(g, seeds, rounds=3, alpha=0.5).collect()
    }
    # python replay over the symmetrized path 1-2-3-4
    sym = {1: [2], 2: [1, 3], 3: [2, 4], 4: [3]}
    y = {(1, 0): 1.0, (4, 1): 1.0}
    f = dict(y)
    for _ in range(3):
        msg = {}
        for (u, c), fv in f.items():
            for v in sym[u]:
                msg[(v, c)] = msg.get((v, c), 0.0) + fv / len(sym[u])
        f = {
            k: 0.5 * msg.get(k, 0.0) + 0.5 * y.get(k, 0.0)
            for k in set(msg) | set(y)
        }
        f = {k: v for k, v in f.items() if v > 0}
    assert got.keys() == f.keys()
    for k in f:
        assert abs(got[k] - f[k]) < 1e-9


def test_msbfs_matches_per_seed_bfs(spark):
    edges = [(1, 2), (2, 3), (3, 4), (2, 5), (9, 1)]
    g = make_graph(spark, edges)
    rows = {r["id"]: (r["reach_mask"], r["n_src"]) for r in
            msbfs_reach(g, seed_max=3, max_hops=4).collect()}
    # seeds are vertices 1, 2, 3 -> bits 1<<1, 1<<2, 1<<3
    b1, b2, b3 = 1 << 1, 1 << 2, 1 << 3
    assert rows[1] == (b1, 1)
    assert rows[2] == (b1 | b2, 2)
    assert rows[3] == (b1 | b2 | b3, 3)
    assert rows[4] == (b1 | b2 | b3, 3)
    assert rows[5] == (b1 | b2, 2)
    assert 9 not in rows  # not a seed (id > 3), nothing reaches it
