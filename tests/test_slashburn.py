"""SlashBurn hub-removal shatter profile — hand-traced fixture."""

from conftest import make_graph

from incubator_hugegraph_computer_spark.operators.structure import slashburn

# hub 0 -> 1..10, chain 1-2-3, separate pair 20-21
EDGES = [(0, i) for i in range(1, 11)] + [(1, 2), (2, 3), (20, 21)]
VERTS = list(range(0, 11)) + [20, 21]


def test_slashburn_profile(spark):
    g = make_graph(spark, EDGES, vertex_ids=VERTS)
    rows = {
        r["round"]: (r["hubs_removed"], r["spokes_removed"], r["gcc_size"])
        for r in slashburn(g, k=1, rounds=3).collect()
    }
    # r1: slash hub 0 (deg 10); remainder 12 verts, GCC {1,2,3}
    assert rows[1] == (1, 9, 3)
    # r2: slash vertex 2 (deg 2); {1,3} isolated -> GCC {1} (min label)
    assert rows[2] == (1, 1, 1)
    # r3: slash the last vertex; nothing remains
    assert rows[3] == (1, 0, 0)
