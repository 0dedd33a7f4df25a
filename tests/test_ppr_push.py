"""Forward-push PPR: mass conservation and convergence to PPR."""

from conftest import make_graph

from incubator_hugegraph_computer_spark.operators.ppr import ppr, ppr_push

EDGES = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 1), (2, 5)]


def test_push_conserves_mass(spark):
    g = make_graph(spark, EDGES)
    rows = ppr_push(g, source=1, eps=1e-3, rounds=6).collect()
    total = sum(r["p"] for r in rows) + sum(r["r"] for r in rows)
    assert abs(total - 1.0) < 1e-5


def test_push_converges_to_ppr(spark):
    # the ACL invariant: |p(v) − ppr(v)| ≤ Σ_u r(u) (total residual),
    # plus the power-iteration tail of the exact side
    g = make_graph(spark, EDGES)
    rows = ppr_push(g, source=1, eps=1e-7, rounds=25).collect()
    est = {r["id"]: r["p"] for r in rows}
    total_r = sum(r["r"] for r in rows)
    exact = {r["id"]: r["rank"] for r in
             ppr(g, source=1, max_iterations=40, tol=0.0).collect()}
    assert total_r < 0.05  # the budget actually drained most residual
    for v, pv in exact.items():
        if pv > 1e-5:
            bound = total_r + 1e-3
            assert abs(est.get(v, 0.0) - pv) < bound, (v, est.get(v), pv)
