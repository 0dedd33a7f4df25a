"""Edge betweenness (per_edge Brandes) — hand-computed fixtures."""

from conftest import make_graph

from incubator_hugegraph_computer_spark.operators.betweenness import betweenness


def test_edge_betweenness_path(spark):
    """Directed path 0→1→2→3: edge (i,i+1) lies on (i+1)·(3−i) paths."""
    g = make_graph(spark, [(0, 1), (1, 2), (2, 3)], vertex_ids=range(4))
    out = {(r["src"], r["dst"]): r["betweenness"] for r in betweenness(g, per_edge=True).collect()}
    assert out == {(0, 1): 3.0, (1, 2): 4.0, (2, 3): 3.0}


def test_edge_betweenness_bridge_dominates(spark):
    """Girvan–Newman's premise: the bridge between two cliques carries
    the most shortest paths of any edge."""
    cl_a = [(a, b) for a in range(4) for b in range(4) if a != b]
    cl_b = [(a, b) for a in range(4, 8) for b in range(4, 8) if a != b]
    g = make_graph(spark, cl_a + cl_b + [(3, 4), (4, 3)], vertex_ids=range(8))
    out = {(r["src"], r["dst"]): r["betweenness"] for r in betweenness(g, per_edge=True).collect()}
    bridge = out[(3, 4)]
    assert bridge == max(out.values())
    assert out[(4, 3)] == bridge  # symmetric construction
    # every clique-internal edge carries strictly less
    assert all(v < bridge for e, v in out.items() if e not in [(3, 4), (4, 3)])


def test_edge_sum_matches_vertex_plus_endpoints(spark):
    """Σ_e eb(e) = Σ over source-target pairs of (path length in edges)
    averaged by multiplicity... cheaper invariant: for each source s,
    Σ_e credits = Σ_v (δ_s(v) + |{v reachable, v≠s}|)·... — instead pin
    the direct identity Σ_e eb(e) = Σ_v vb(v) + (# connected ordered
    pairs): each shortest path of k edges contributes k to the edge sum,
    its k−1 interior vertices to the vertex sum, and 1 to the pair count
    (averaged over path multiplicity)."""
    edges = [(0, 1), (1, 2), (2, 3), (0, 2), (3, 0)]
    g = make_graph(spark, edges, vertex_ids=range(4))
    eb = sum(r["betweenness"] for r in betweenness(g, per_edge=True).collect())
    vb = sum(r["betweenness"] for r in betweenness(g).collect())
    # connected ordered pairs (s != t, t reachable from s) in this graph
    reach = {0: {1, 2, 3}, 1: {2, 3, 0}, 2: {3, 0, 1}, 3: {0, 1, 2}}
    pairs = sum(len(v) for v in reach.values())
    assert abs(eb - (vb + pairs)) < 1e-9
