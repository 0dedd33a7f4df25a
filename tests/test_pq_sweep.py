"""Tests for the ACL sweep cut (ppr_sweep) and product-quantization
ANN (pq_topk)."""

from conftest import make_graph

from pyspark.sql import functions as F

from incubator_hugegraph_computer_spark.functions.similarity import pq_topk
from incubator_hugegraph_computer_spark.operators.ppr import ppr_sweep

# two 4-cliques joined by one bridge edge (3-4) — the textbook
# local-clustering fixture: the sweep's conductance minimum must land
# exactly at the clique boundary
CLIQUE_A = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
CLIQUE_B = [(4, 5), (4, 6), (4, 7), (5, 6), (5, 7), (6, 7)]
BRIDGE = [(3, 4)]
# both directions: PPR follows out-edges, so the walk itself must see
# the undirected structure for the clique ordering to be clean
EDGES = [
    e
    for s, d in CLIQUE_A + CLIQUE_B + BRIDGE
    for e in [(s, d), (d, s)]
]


def test_ppr_sweep_finds_the_clique(spark):
    g = make_graph(spark, EDGES, vertex_ids=range(8))
    curve = ppr_sweep(g, source=0, max_iterations=8, sweep_max=8).collect()
    by_pos = {r["pos"]: r for r in curve}
    assert sorted(by_pos) == list(range(1, 9))
    # prefix of size 4 is exactly clique A: cut=1 (the bridge),
    # vol = 3+3+3+4 = 13, vol_total = 26 → phi = 1/13
    prefix4 = {by_pos[p]["id"] for p in range(1, 5)}
    assert prefix4 == {0, 1, 2, 3}
    assert abs(by_pos[4]["phi"] - 1.0 / 13.0) < 1e-6
    # ... and it is the unique minimum of the curve (pos 8 = whole
    # graph has vol == vol_total → denominator 0 → NULL phi)
    assert by_pos[8]["phi"] is None
    finite = {p: by_pos[p]["phi"] for p in range(1, 8)}
    assert min(finite, key=finite.get) == 4
    # the seed itself is position 1 (highest degree-normalized mass)
    assert by_pos[1]["id"] == 0


def test_ppr_sweep_cut_vol_consistency(spark):
    """phi at each prefix equals the brute-force conductance."""
    g = make_graph(spark, EDGES, vertex_ids=range(8))
    curve = sorted(
        ppr_sweep(g, source=5, max_iterations=8, sweep_max=8).collect(),
        key=lambda r: r["pos"],
    )
    sym = set()
    for s, d in EDGES:
        sym.add((s, d))
        sym.add((d, s))
    deg = {v: sum(1 for s, _ in sym if s == v) for v in range(8)}
    vol_total = len(sym)
    prefix = []
    for r in curve:
        prefix.append(r["id"])
        in_s = set(prefix)
        cut = sum(1 for s, d in sym if (s in in_s) != (d in in_s)) // 2
        vol = sum(deg[v] for v in in_s)
        denom = min(vol, vol_total - vol)
        if denom == 0:
            assert r["phi"] is None
        else:
            assert abs(r["phi"] - cut / denom) < 1e-6, r


def _toy_embeddings(spark, n_groups=4, per_group=6, dim=8):
    """Vectors clustered tightly around distinct one-hot corners; the
    i-th member of each group gets a small deterministic jitter."""
    rows = []
    vid = 0
    for gidx in range(n_groups):
        for i in range(per_group):
            v = [0.0] * dim
            v[gidx] = 10.0
            v[(gidx + 4) % dim] = 10.0
            v[dim - 1 - gidx] += 0.01 * i  # tie-free jitter
            rows.append((vid, v))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_topk_recovers_groups(spark):
    emb = _toy_embeddings(spark)
    queries = emb.where(F.col("vec_id").isin(0, 7))  # one from group 0, one from group 1
    out = pq_topk(emb, queries, m=2, k=4, iters=2, topk=5, dim=8).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 7}
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
        # adc non-decreasing with rank, query excluded
        adcs = [r["adc"] for r in rows]
        assert adcs == sorted(adcs)
        assert all(r["vec_id"] != qid for r in rows)
        # the 5 nearest under ADC are the 5 other members of the
        # query's group (same codebook cell ⇒ adc 0 to own centroid)
        group = qid // 6
        assert {r["vec_id"] // 6 for r in rows} == {group}


def test_pq_topk_deterministic(spark):
    emb = _toy_embeddings(spark)
    queries = emb.where(F.col("vec_id") < 2)
    a = sorted(map(tuple, pq_topk(emb, queries, m=4, k=3, iters=1, topk=4, dim=8).collect()))
    b = sorted(map(tuple, pq_topk(emb, queries, m=4, k=3, iters=1, topk=4, dim=8).collect()))
    assert a == b


def test_pq_topk_rejects_bad_dim(spark):
    emb = _toy_embeddings(spark)
    try:
        pq_topk(emb, emb.limit(1), m=3, dim=8)
        assert False, "expected ValueError"
    except ValueError:
        pass


def _interleaved_embeddings(spark, n_groups=4, per_group=6, dim=8):
    """Same clustered corners as _toy_embeddings, but group ids
    round-robin over vec_id (group = vec_id % n_groups) so the
    deterministic lowest-id k-means init sees one vector per group —
    a grouped-id layout hands the coarse quantizer a degenerate init
    (all k seeds inside one cluster), which is a property of the toy
    ordering, not of the operator."""
    rows = []
    for vid in range(n_groups * per_group):
        gidx, i = vid % n_groups, vid // n_groups
        v = [0.0] * dim
        v[gidx] = 10.0
        v[(gidx + 4) % dim] = 10.0
        v[dim - 1 - gidx] += 0.01 * i
        rows.append((vid, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_sq8_topk_recovers_groups(spark):
    from incubator_hugegraph_computer_spark.functions.similarity import sq8_topk

    emb = _toy_embeddings(spark)
    queries = emb.where(F.col("vec_id").isin(0, 7))
    out = sq8_topk(emb, queries, topk=5, dim=8).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 7}
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
        adcs = [r["adc"] for r in rows]
        assert adcs == sorted(adcs)
        assert all(r["vec_id"] != qid for r in rows)
        # SQ8 at 255 levels over a [0, 10] span quantizes at ~0.04
        # resolution — the 5 nearest must be the query's own group
        assert {r["vec_id"] // 6 for r in rows} == {qid // 6}


def test_sq8_topk_matches_exact_l2_on_wide_margins(spark):
    """With 255 quantization levels and group separation 100× the
    jitter, SQ8's neighbor SET AND ORDER must equal the exact L2
    ranking — near-full recall is the SQ8 contract."""
    from incubator_hugegraph_computer_spark.functions.similarity import sq8_topk

    emb = _toy_embeddings(spark)
    queries = emb.where(F.col("vec_id") < 2)
    approx = [
        (r["query_id"], r["rank"], r["vec_id"])
        for r in sq8_topk(emb, queries, topk=5, dim=8).collect()
    ]
    rows = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    exact = []
    for qid in (0, 1):
        d = sorted(
            (sum((a - b) ** 2 for a, b in zip(rows[qid], v)), vid)
            for vid, v in rows.items()
            if vid != qid
        )
        exact += [(qid, rank + 1, vid) for rank, (_, vid) in enumerate(d[:5])]
    assert sorted(approx) == sorted(exact)


def test_ivfpq_topk_recovers_groups(spark):
    from incubator_hugegraph_computer_spark.functions.similarity import ivfpq_topk

    emb = _interleaved_embeddings(spark)
    queries = emb.where(F.col("vec_id").isin(0, 13))  # groups 0 and 1
    out = ivfpq_topk(
        emb, queries, n_centroids=4, probe=2, m=2, k=4, iters=2, topk=5, dim=8
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 13}
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        adcs = [r["adc"] for r in rows]
        assert adcs == sorted(adcs)
        assert all(r["vec_id"] != qid for r in rows)
        # nearest probed neighbors are the query's own tight group
        group = qid % 4
        assert {r["vec_id"] % 4 for r in rows[:5]} == {group}


def test_ivfpq_probe_widens_candidates(spark):
    """probe=n_centroids degenerates to plain PQ over residuals: every
    list is scanned, so the result count can only grow with probe."""
    from incubator_hugegraph_computer_spark.functions.similarity import ivfpq_topk

    emb = _interleaved_embeddings(spark)
    queries = emb.where(F.col("vec_id") < 1)
    narrow = ivfpq_topk(
        emb, queries, n_centroids=4, probe=1, m=2, k=4, iters=1, topk=50, dim=8
    ).count()
    wide = ivfpq_topk(
        emb, queries, n_centroids=4, probe=4, m=2, k=4, iters=1, topk=50, dim=8
    ).count()
    assert narrow <= wide
    assert wide == 23  # all 24 vectors minus the query itself
