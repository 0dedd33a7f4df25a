"""FastRP exact-integer embeddings, temporal reachability, PMI graph."""

import hashlib
import math

from conftest import make_graph

from incubator_hugegraph_computer_spark.functions.text import pmi_cooccurrence
from incubator_hugegraph_computer_spark.graph import Graph
from incubator_hugegraph_computer_spark.operators.bfs import temporal_reachability
from incubator_hugegraph_computer_spark.operators.embeddings import fastrp_embed


def _sign(vid, d, seed):
    h = hashlib.md5(f"{vid}:{d}:{seed}".encode()).hexdigest()
    b = int(h[:8], 16) % 6
    return 1 if b == 0 else (-1 if b == 1 else 0)


def test_fastrp_matches_reference_recurrence(spark):
    edges = [(1, 2), (2, 3), (3, 1), (3, 4)]
    g = make_graph(spark, edges)
    dim, iters, seed, weights = 4, 2, 7, (1, 4)
    got = {
        (r["id"], r["d"]): r["f"]
        for r in fastrp_embed(g, dim=dim, iters=iters, seed=seed, weights=weights).collect()
    }
    # replay in plain python over the symmetrized adjacency
    sym = {}
    for s, d in edges:
        sym.setdefault(s, set()).add(d)
        sym.setdefault(d, set()).add(s)
    verts = sorted(sym)
    state = {(v, j): _sign(v, j, seed) for v in verts for j in range(dim)}
    acc = {(v, j): 0 for v in verts for j in range(dim)}
    for t in range(iters):
        state = {
            (v, j): sum(state[(u, j)] for u in sym[v])
            for v in verts
            for j in range(dim)
        }
        for k in acc:
            acc[k] += weights[t] * state[k]
    assert got == acc


def test_temporal_reachability_respects_time(spark):
    # 1 -(ts 5)-> 2 -(ts 3)-> 3 is NOT time-respecting; 2 -(ts 7)-> 4 is.
    rows = [(1, 2, 5), (2, 3, 3), (2, 4, 7), (1, 5, 2), (5, 3, 4)]
    edges = spark.createDataFrame(rows, "src long, dst long, ts long")
    verts = spark.createDataFrame([(i,) for i in range(1, 6)], "id long")
    g = Graph(verts, edges, num_partitions=4)
    arr = {r["id"]: r["arrival"] for r in temporal_reachability(g, 1, max_hops=4).collect()}
    assert arr[1] == -1
    assert arr[2] == 5 and arr[4] == 7
    # 3 is reached only via 1->5 (ts2) ->3 (ts4)
    assert arr[3] == 4 and arr[5] == 2


def test_pmi_cooccurrence_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta"),
            (2, "alpha beta"),
            (3, "alpha gamma"),
            (4, "beta gamma"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["tok_a"], r["tok_b"]): (r["n_pair"], r["pmi"])
        for r in pmi_cooccurrence(docs, min_pair=2).collect()
    }
    # only (alpha, beta) co-occurs >= 2 times; df_alpha=3 df_beta=3 N=4
    assert set(out) == {("alpha", "beta")}
    n_pair, pmi = out[("alpha", "beta")]
    assert n_pair == 2
    assert abs(pmi - round(math.log(2 * 4 / 9), 6)) < 1e-9
