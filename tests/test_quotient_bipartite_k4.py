"""Quotient aggregation, bipartiteness check, K4 counting."""

import itertools

import numpy as np
import pytest

from tests.conftest import make_graph


# ------------------------------------------------------------ quotient
def test_quotient_hand_fixture(spark):
    from incubator_hugegraph_computer_spark.operators.quotient import quotient_graph
    from pyspark.sql import functions as F

    # groups: even/odd. edges 0→1, 0→3, 2→1 cross (0,1); 1→3 intra (1,1);
    # 2→4 intra (0,0)
    g = make_graph(spark, [(0, 1), (0, 3), (2, 1), (1, 3), (2, 4)])
    mapping = g.vertices.select("id", (F.col("id") % 2).alias("grp"))
    out = {
        (r.gsrc, r.gdst): (r.n_edges, r.n_src_vertices)
        for r in quotient_graph(g, mapping).collect()
    }
    assert out == {(0, 1): (3, 2), (1, 1): (1, 1), (0, 0): (1, 1)}


def test_quotient_preserves_edge_total(spark):
    from incubator_hugegraph_computer_spark.operators.quotient import quotient_graph
    from pyspark.sql import functions as F

    rng = np.random.RandomState(5)
    edges = sorted({(int(a), int(b)) for a, b in rng.randint(0, 40, (150, 2)) if a != b})
    g = make_graph(spark, edges)
    mapping = g.vertices.select("id", (F.col("id") % 7).alias("grp"))
    rows = quotient_graph(g, mapping).collect()
    assert sum(r.n_edges for r in rows) == len(edges)


# ------------------------------------------------------------ bipartite
def _py_bipartite(edges, vertices):
    """Reference 2-coloring check per component."""
    adj = {v: set() for v in vertices}
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    color, result = {}, {}
    for v in sorted(vertices):
        if v in color:
            continue
        comp, ok, queue = [v], True, [v]
        color[v] = 0
        while queue:
            u = queue.pop()
            for w in adj[u]:
                if w not in color:
                    color[w] = color[u] ^ 1
                    comp.append(w)
                    queue.append(w)
                elif color[w] == color[u]:
                    ok = False
        result[min(comp)] = (len(comp), ok)
    return result


def test_bipartite_even_odd_components(spark):
    from incubator_hugegraph_computer_spark.operators.bipartite import bipartite_check

    # comp 0: 4-cycle (bipartite); comp 10: triangle (odd); comp 20:
    # single edge (bipartite); vertex 30 isolated (trivially bipartite)
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (10, 11), (11, 12), (12, 10), (20, 21)]
    g = make_graph(spark, edges, vertex_ids=[0, 1, 2, 3, 10, 11, 12, 20, 21, 30])
    out = {r.comp: (r.n_vertices, r.is_bipartite) for r in bipartite_check(g).collect()}
    assert out == {0: (4, True), 10: (3, False), 20: (2, True), 30: (1, True)}


def test_bipartite_matches_bruteforce(spark):
    from incubator_hugegraph_computer_spark.operators.bipartite import bipartite_check

    rng = np.random.RandomState(9)
    n = 40
    edges = sorted({(int(a), int(b)) for a, b in rng.randint(0, n, (60, 2)) if a != b})
    verts = range(n)
    g = make_graph(spark, edges, vertex_ids=verts)
    expected = _py_bipartite(edges, set(verts))
    out = {r.comp: (r.n_vertices, r.is_bipartite) for r in bipartite_check(g).collect()}
    assert out == expected


# ------------------------------------------------------------ K4
def test_k4_on_k5(spark):
    from incubator_hugegraph_computer_spark.operators.cliques import k4_count

    edges = list(itertools.combinations(range(5), 2))
    g = make_graph(spark, edges)
    out = {r.id: r.k4 for r in k4_count(g).collect()}
    assert out == {v: 4 for v in range(5)}  # C(4,3) per vertex of K5


def test_k4_matches_bruteforce(spark):
    from incubator_hugegraph_computer_spark.operators.cliques import k4_count

    rng = np.random.RandomState(13)
    n = 18
    edges = sorted({(int(a), int(b)) for a, b in rng.randint(0, n, (110, 2)) if a != b})
    und = {(min(a, b), max(a, b)) for a, b in edges}
    expected = {v: 0 for v in range(n)}
    present = set()
    for a, b in und:
        present.add(a)
        present.add(b)
    for quad in itertools.combinations(sorted(present), 4):
        if all(
            (min(p, q), max(p, q)) in und for p, q in itertools.combinations(quad, 2)
        ):
            for v in quad:
                expected[v] += 1
    g = make_graph(spark, edges, vertex_ids=range(n))
    out = {r.id: r.k4 for r in k4_count(g).collect()}
    assert out == expected


def test_hostrank_matches_numpy(spark):
    """host_rank == literal weighted-PageRank recurrence over the
    quotient of a small graph."""
    import pytest as _pt
    from pyspark.sql import functions as F

    from incubator_hugegraph_computer_spark.operators.quotient import host_rank

    rng = np.random.RandomState(29)
    n = 30
    edges = sorted({(int(a), int(b)) for a, b in rng.randint(0, n, (120, 2)) if a != b})
    mod = 5
    # python quotient
    from collections import Counter

    q = Counter(((a % mod), (b % mod)) for a, b in edges if a % mod != b % mod)
    hosts = sorted({g for pair in q for g in pair})
    out_pairs = {h: sorted(d for (s, d) in q if s == h) for h in hosts}
    nh = len(hosts)
    r = {h: 1.0 / nh for h in hosts}
    d = 0.85
    for _ in range(6):
        msg = {h: 0.0 for h in hosts}
        dang = sum(r[h] for h in hosts if not out_pairs[h])
        for s in hosts:
            if out_pairs[s]:
                for t in out_pairs[s]:
                    msg[t] += r[s] / len(out_pairs[s]) * q[(s, t)]
        r = {h: (1 - d) / nh + d * (msg[h] + dang / nh) for h in hosts}

    g = make_graph(spark, edges, vertex_ids=range(n))
    mapping = g.vertices.select("id", (F.col("id") % mod).alias("grp"))
    got = {
        row.grp: row.rank
        for row in host_rank(g, mapping, max_iterations=6).collect()
    }
    assert set(got) == set(hosts)
    for h in hosts:
        assert got[h] == _pt.approx(r[h], abs=1e-9)


def test_quotient_stream_matches_batch(spark, tmp_path):
    """Streamed incremental host-pair totals == one-shot quotient over
    the union of all batches; replays of committed batches are no-ops."""
    import os
    import time

    from pyspark.sql import functions as F

    from incubator_hugegraph_computer_spark.operators.quotient import quotient_graph
    from incubator_hugegraph_computer_spark.streaming.quotient import (
        read_quotient,
        run_quotient_stream,
    )

    edges = [(i, (i * 13 + 5) % 40) for i in range(120)]
    edges = [(s, d) for s, d in edges if s != d]
    src = tmp_path / "edges"
    src.mkdir()
    for chunk in range(3):
        part = edges[chunk * 40 : (chunk + 1) * 40]
        df = spark.createDataFrame(part, "src long, dst long").coalesce(1)
        pdir = str(src / f"chunk{chunk}.parquet")
        df.write.mode("overwrite").parquet(pdir + ".tmp")
        fname = [f for f in os.listdir(pdir + ".tmp") if f.endswith(".parquet")][0]
        dest = str(src / f"part-{chunk:05d}.parquet")
        os.rename(os.path.join(pdir + ".tmp", fname), dest)
        ts = time.time() + chunk
        os.utime(dest, (ts, ts))

    mod = 7
    run_quotient_stream(
        spark, str(src), str(tmp_path / "ck"), str(tmp_path / "hostq"), mod=mod
    )
    streamed = {
        (r.gsrc, r.gdst): r.n_edges
        for r in read_quotient(spark, str(tmp_path / "hostq")).collect()
    }
    g = make_graph(spark, edges)
    mapping = g.vertices.select("id", (F.col("id") % mod).alias("grp"))
    full = {
        (r.gsrc, r.gdst): r.n_edges for r in quotient_graph(g, mapping).collect()
    }
    assert streamed == full

    # replay safety: re-running the drained stream changes nothing
    run_quotient_stream(
        spark, str(src), str(tmp_path / "ck2"), str(tmp_path / "hostq"), mod=mod
    )
    again = {
        (r.gsrc, r.gdst): r.n_edges
        for r in read_quotient(spark, str(tmp_path / "hostq")).collect()
    }
    assert again == full


def test_snapshot_diff_hand_fixture(spark):
    from pyspark.sql import functions as F

    from incubator_hugegraph_computer_spark.operators.quotient import snapshot_diff

    old = spark.createDataFrame([(0, 1), (2, 3), (4, 5)], "src long, dst long")
    new = spark.createDataFrame([(0, 1), (2, 3), (6, 7), (8, 1)], "src long, dst long")
    ids = spark.range(0, 9).select("id", (F.col("id") % 2).alias("grp"))
    out = {
        (r.gsrc, r.gdst): (r.n_added, r.n_removed)
        for r in snapshot_diff(old, new, ids).collect()
    }
    # added: (6,7)->(0,1), (8,1)->(0,1); removed: (4,5)->(0,1)
    assert out == {(0, 1): (2, 1)}


def test_comp_sizes_histogram(spark):
    from incubator_hugegraph_computer_spark.operators.stats import (
        component_size_distribution,
    )

    # components: {0,1,2} (size 3), {10,11} and {20,21} (two size 2), 30
    edges = [(0, 1), (1, 2), (10, 11), (20, 21)]
    g = make_graph(spark, edges, vertex_ids=[0, 1, 2, 10, 11, 20, 21, 30])
    out = {r.size: r.n_components for r in component_size_distribution(g).collect()}
    assert out == {3: 1, 2: 2, 1: 1}


def test_bipartite_refuses_exhausted_depth(spark):
    import pytest as _pt

    from incubator_hugegraph_computer_spark.operators.bipartite import bipartite_check

    # a 6-chain needs 5 BFS rounds from vertex 0; max_depth=2 must refuse
    g = make_graph(spark, [(i, i + 1) for i in range(5)])
    with _pt.raises(RuntimeError, match="max_depth"):
        bipartite_check(g, max_depth=2)


def test_hostrank_empty_quotient_returns_empty(spark):
    from pyspark.sql import functions as F

    from incubator_hugegraph_computer_spark.operators.quotient import host_rank

    g = make_graph(spark, [(0, 1), (1, 2)])
    mapping = g.vertices.select("id", (F.col("id") % 1).alias("grp"))  # all grp 0
    assert host_rank(g, mapping).count() == 0
