"""WL refinement, closed-form triad census, vertex-cut report."""

from conftest import make_graph

from incubator_hugegraph_computer_spark.operators.motifs import triad_census
from incubator_hugegraph_computer_spark.operators.stats import vertex_cut_stats
from incubator_hugegraph_computer_spark.operators.wl import wl_class_sizes, wl_refine

# path 1-2-3-4 plus triangle 5-6-7 (disjoint)
PATH_TRI = [(1, 2), (2, 3), (3, 4), (5, 6), (6, 7), (7, 5)]


def test_wl_distinguishes_roles(spark):
    g = make_graph(spark, PATH_TRI, vertex_ids=range(1, 8))
    col = {r["id"]: r["wl_color"] for r in wl_refine(g, rounds=3).collect()}
    # path endpoints are structurally equivalent, so are the middles
    assert col[1] == col[4]
    assert col[2] == col[3]
    assert col[1] != col[2]
    # triangle corners are all equivalent, and distinct from path roles
    assert col[5] == col[6] == col[7]
    assert col[5] not in (col[1], col[2])


def test_wl_round_zero_is_degree(spark):
    g = make_graph(spark, PATH_TRI, vertex_ids=range(1, 8))
    col = {r["id"]: r["wl_color"] for r in wl_refine(g, rounds=0).collect()}
    # degree-1 endpoints vs degree-2 middles/corners
    assert col[1] == col[4]
    assert col[2] == col[3] == col[5] == col[6] == col[7]
    assert col[1] != col[2]


def test_wl_class_sizes(spark):
    g = make_graph(spark, PATH_TRI, vertex_ids=range(1, 8))
    hist = sorted(
        r["class_size"] for r in wl_class_sizes(g, rounds=3).collect()
    )
    assert hist == [2, 2, 3]


def test_triad_census_known_graph(spark):
    # 1-2, 2-3, 1-3 (triangle), 3-4 pendant: n=4 m=4 T=1 W=5
    g = make_graph(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    row = triad_census(g).collect()[0]
    assert row["n_vertices"] == 4 and row["n_edges"] == 4
    assert row["triads_triangle"] == 1
    assert row["triads_path"] == 2  # W - 3T = 5 - 3
    assert row["triads_one_edge"] == 1  # m(n-2) - 2*path - 3T = 8-4-3
    assert row["triads_empty"] == 0  # C(4,3) = 4 = 1+2+1


def test_triad_census_totals(spark):
    g = make_graph(spark, PATH_TRI, vertex_ids=range(1, 8))
    row = triad_census(g).collect()[0]
    n = row["n_vertices"]
    assert (
        row["triads_empty"]
        + row["triads_one_edge"]
        + row["triads_path"]
        + row["triads_triangle"]
        == n * (n - 1) * (n - 2) // 6
    )
    assert row["triads_triangle"] == 1


def test_vertex_cut_grid_bounds_hub_replication(spark):
    # star: hub 0 with 40 leaves — grid must bound the hub's copies by
    # R+C-1; the 1-D edge hash replicates it onto ~all 16 shards.
    star = [(0, i) for i in range(1, 41)]
    g = make_graph(spark, star, vertex_ids=range(0, 41))
    rows = {r["strategy"]: r for r in vertex_cut_stats(g, 4, 4).collect()}
    assert rows["grid2d"]["n_shards"] == 16
    # total copies = replication_x1m * nv / 1e6; hub copies <= 7 under
    # grid (R+C-1) while every leaf has exactly 1 copy -> mean <= (40+7)/41
    assert rows["grid2d"]["replication_x1m"] <= int(47 / 41 * 1_000_000) + 1
    assert rows["edge_hash_1d"]["replication_x1m"] > rows["grid2d"][
        "replication_x1m"
    ]
    # every strategy places all 40 edges: max shard load sanity
    assert 1 <= rows["grid2d"]["max_shard_edges"] <= 40
