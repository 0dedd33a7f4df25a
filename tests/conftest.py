import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incubator_hugegraph_computer_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="hgc-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_confs={"spark.driver.memory": "4g"},
    )
    yield s


def make_graph(spark, edge_list, vertex_ids=None):
    """Small fixture graph from a python edge list."""
    from incubator_hugegraph_computer_spark.graph import Graph

    edges = spark.createDataFrame(
        [(int(s), int(d)) for s, d in edge_list], "src long, dst long"
    )
    if vertex_ids is None:
        return Graph.from_edges(edges, num_partitions=4)
    verts = spark.createDataFrame([(int(v),) for v in vertex_ids], "id long")
    return Graph(verts, edges, num_partitions=4)


# ---------------------------------------------------------------- fixtures
# Golden graph A — TriangleCountTest.java:70-89 (FIXTURES.md §3)
TRI_VERTICES = {"A": 0, "B": 1, "C": 2, "D": 3, "E": 4}
TRI_EDGES = [
    ("A", "B"), ("A", "C"), ("B", "C"), ("C", "D"),
    ("D", "A"), ("D", "E"), ("E", "D"), ("E", "C"),
]
TRI_EXPECTED = {"A": 2, "B": 1, "C": 3, "D": 2, "E": 1}  # TriangleCountTest.java:42-46

# Golden graph B — LpaTest.java:103-117 (FIXTURES.md §4): 4 communities
LPA_EDGES = [
    (0, 4), (0, 7), (0, 10), (0, 11), (0, 14), (0, 16),
    (1, 17), (2, 5), (2, 6), (2, 8), (2, 12),
    (3, 9), (3, 13), (9, 15), (16, 5),
]
LPA_VERTEX_IDS = list(range(18))

# Golden graph C — FIXTURES.md §5: dangling vertex, hub, 2-cycle,
# isolated vertex, >=2 weak components.
PRWCC_EDGES = [
    # component 1: hub 0 fans out; 5 is dangling; 6<->7 cycle
    (0, 1), (0, 2), (0, 3), (0, 4), (0, 5),
    (1, 2), (2, 0), (3, 5), (4, 6), (6, 7), (7, 6),
    # component 2: chain with a dangler
    (10, 11), (11, 12), (12, 10), (12, 13),
]
PRWCC_VERTEX_IDS = list(range(8)) + [10, 11, 12, 13] + [20]  # 20 isolated
