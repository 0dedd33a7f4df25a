"""SpreadFilter expression-DSL parity tests.

The reference's filtered rings detection takes a JSON config of MVEL
property expressions (``rings/filter/SpreadFilter.java:54-140``,
``FilterDescribe.java``); these tests check the compiled-Column
translation (functions/filter_dsl.py) expression by expression, then
run rings_with_filter end-to-end against a brute-force python oracle
that applies the reference's compute0/compute filter rules literally.
"""

import itertools

import pytest
from pyspark.sql import functions as F

from incubator_hugegraph_computer_spark.functions.filter_dsl import (
    SpreadFilterSpec,
    compile_mvel,
    mentions_message,
)
from incubator_hugegraph_computer_spark.graph import Graph
from incubator_hugegraph_computer_spark.operators.rings import rings, rings_with_filter


def _eval(spark, expr, element=None, message=None):
    """Evaluate one MVEL expression against a single-row frame whose
    columns carry the $element / $message property values."""
    row = {}
    for k, v in (element or {}).items():
        row[f"el_{k}"] = v
    for k, v in (message or {}).items():
        row[f"msg_{k}"] = v
    df = spark.createDataFrame([tuple(row.values())], list(row.keys())) if row else (
        spark.range(1)
    )
    col = compile_mvel(
        expr,
        lambda p: F.col(f"el_{p}"),
        (lambda p: F.col(f"msg_{p}")) if message is not None else None,
    )
    return df.select(col.alias("v")).collect()[0]["v"]


def test_mvel_comparisons_and_precedence(spark):
    el = {"age": 25, "weight": 0.5, "name": "alice"}
    cases = [
        ("$element.age > 20", True),
        ("$element.age > 20 && $element.weight < 0.4", False),
        ("$element.age > 20 || $element.weight < 0.4", True),
        ("!($element.age > 20)", False),
        # && binds tighter than || (MVEL/Java order)
        ("$element.age > 100 || $element.age > 20 && $element.weight >= 0.5", True),
        ("$element.age + 5 == 30", True),
        ("$element.age * 2 - 10 == 40", True),
        # * binds tighter than +
        ("$element.age + $element.age * 2 == 75", True),
        ("$element.age % 7 == 4", True),
        ("$element.name == 'alice'", True),
        ("$element.name != \"bob\"", True),
        ("-$element.age < 0", True),
        ("($element.age > 20) == true", True),
        ("$element.age / 2 >= 12.5", True),
    ]
    for expr, want in cases:
        assert _eval(spark, expr, el) is want, expr


def test_mvel_message_binding(spark):
    got = _eval(
        spark,
        "$element.weight > 0.1 && $message.weight <= $element.weight",
        {"weight": 0.5},
        {"weight": 0.3},
    )
    assert got is True
    # $message unbound (compute0 / vertex context) must refuse, not guess
    with pytest.raises(ValueError, match=r"\$message"):
        _eval(spark, "$message.weight > 0", {"weight": 0.5})


def test_mvel_rejects_garbage():
    with pytest.raises(ValueError):
        compile_mvel("$element.age @ 3", lambda p: F.col(p))
    with pytest.raises(ValueError):
        compile_mvel("$element.age > ", lambda p: F.col(p))
    with pytest.raises(ValueError):
        compile_mvel("someIdent > 3", lambda p: F.col(p))


def test_mentions_message_literal_rule():
    # the reference's rule is a literal contains("$message")
    # (SpreadFilter.java:57-59)
    assert mentions_message("$message.weight > 0")
    assert not mentions_message("$element.weight > 0")


def test_spec_label_dispatch(spark):
    spec = SpreadFilterSpec(
        '{"vertex_filter": ['
        '{"label": "*", "property_filter": "$element.age > 10"},'
        '{"label": "person", "property_filter": "$element.age < 30"},'
        '{"label": "person", "property_filter": "$element.age < 40"}]}'
    )
    df = spark.createDataFrame(
        [("person", 20), ("person", 35), ("person", 5), ("item", 99), ("item", 5)],
        "label string, age long",
    )
    got = [
        r["ok"]
        for r in df.select(
            spec.vertex_filter(lambda p: F.col(p), F.col("label")).alias("ok")
        ).collect()
    ]
    # '*' AND label item must both pass (allMatch); duplicate person
    # items keep the LAST (age < 40, HashMap.put); items pass '*' only
    assert got == [True, True, False, True, False]


def test_spec_empty_and_missing_label_pass(spark):
    # empty filter list -> everything passes (expressions() PASS rule)
    spec = SpreadFilterSpec("{}")
    df = spark.range(3)
    assert all(
        r["ok"] for r in df.select(spec.vertex_filter(lambda p: F.col(p)).alias("ok")).collect()
    )
    # items exist but none match this label -> allMatch over empty = pass
    spec2 = SpreadFilterSpec(
        '{"vertex_filter": [{"label": "person", "property_filter": "$element.age > 100"}]}'
    )
    df2 = spark.createDataFrame([("item", 1)], "label string, age long")
    assert df2.select(
        spec2.vertex_filter(lambda p: F.col(p), F.col("label")).alias("ok")
    ).collect()[0]["ok"]


def test_spec_no_message_edge_filter_exclusion():
    spec = SpreadFilterSpec(
        '{"edge_filter": ['
        '{"label": "*", "property_filter": "$element.weight > 0.05"},'
        '{"label": "knows", "property_filter": "$message.weight <= $element.weight"}]}'
    )
    # compute0 context keeps only items that never mention $message
    kept = [i.expr for i in spec.edge_items if not mentions_message(i.expr)]
    assert kept == ["$element.weight > 0.05"]
    assert spec.message_props() == ["weight"]


# ------------------------------------------------------- end-to-end rings

_VERTS = [(i, "person" if i % 2 == 0 else "item", float(i * 10)) for i in range(7)]
_EDGES = [
    # (src, dst, weight): several overlapping directed cycles
    (0, 1, 0.30), (1, 2, 0.40), (2, 0, 0.50),          # 0-1-2 nondecreasing
    (2, 3, 0.20), (3, 0, 0.10),                        # 0-1-2-3 w/ decreasing tail
    (1, 0, 0.90),                                      # 2-cycle 0-1
    (3, 4, 0.60), (4, 3, 0.02),                        # 2-cycle with tiny edge
    (4, 5, 0.70), (5, 4, 0.80),                        # 2-cycle both heavy
    (5, 6, 0.50), (6, 5, 0.55),                        # touches filtered vertex 6
    (2, 2, 0.99),                                      # self-loop: dropped
]

_DESCRIBE = {
    "vertex_filter": [{"label": "*", "property_filter": "$element.age < 60"}],
    "edge_filter": [
        {"label": "*", "property_filter": "$element.weight > 0.05"},
        {"label": "knows",
         "property_filter": "$element.weight >= 0.1 && $message.weight <= $element.weight"},
    ],
}


def _filtered_rings_oracle():
    """Brute force with the reference's literal rules: vertices passing
    the vertex filter; first hop = no-$message items only; every later
    hop (incl. the closing edge) = all edge items with $message bound to
    the previous edge's weight; rings recorded min-anchored."""
    vf = {v for v, _, age in _VERTS if age < 60}
    adj = {}
    for s, d, w in _EDGES:
        if s != d and s in vf and d in vf:
            adj.setdefault(s, []).append((d, w))

    def first_ok(w):
        return w > 0.05

    def spread_ok(w, prev_w):
        return w > 0.05 and (w >= 0.1 and prev_w <= w)

    out = []
    for start in sorted(vf):
        stack = [(start, [start], None)]
        while stack:
            cur, path, prev_w = stack.pop()
            for nxt, w in adj.get(cur, []):
                ok = first_ok(w) if prev_w is None else spread_ok(w, prev_w)
                if not ok:
                    continue
                if nxt == start and prev_w is not None:
                    out.append(tuple(path))
                elif nxt > start and nxt not in path:
                    stack.append((nxt, path + [nxt], w))
    return sorted(out)


def _property_graph(spark):
    verts = spark.createDataFrame(
        [(v, lab, {"age": age}) for v, lab, age in _VERTS],
        "id long, label string, properties map<string,double>",
    )
    edges = spark.createDataFrame(
        [(s, d, "knows", {"weight": w}) for s, d, w in _EDGES],
        "src long, dst long, label string, properties map<string,double>",
    )
    return Graph(verts, edges, num_partitions=4)


def test_rings_with_filter_fixture(spark):
    g = _property_graph(spark)
    got = sorted(tuple(r["path"]) for r in rings_with_filter(g, _DESCRIBE, 6).collect())
    want = _filtered_rings_oracle()
    assert want, "fixture must actually contain filtered rings"
    # and the filter must actually remove something vs the unfiltered run
    assert got == want
    unfiltered = rings(Graph(g.vertices.select("id"), g.edges.select("src", "dst"), 4), 6)
    assert len(got) < unfiltered.count()


def test_rings_with_filter_empty_config_matches_plain(spark):
    g = _property_graph(spark)
    got = sorted(tuple(r["path"]) for r in rings_with_filter(g, "{}", 5).collect())
    plain = rings(Graph(g.vertices.select("id"), g.edges.select("src", "dst"), 4), 5)
    assert got == sorted(tuple(r["path"]) for r in plain.collect())


def test_rings_with_filter_plain_columns(spark):
    """Edges/vertices with top-level property columns (no map) resolve
    through the e_/plain-column path."""
    verts = spark.createDataFrame(
        [(v, float(age)) for v, _, age in _VERTS], "id long, age double"
    )
    edges = spark.createDataFrame(
        [(s, d, w) for s, d, w in _EDGES], "src long, dst long, weight double"
    )
    g = Graph(verts, edges, num_partitions=4)
    describe = {
        "vertex_filter": [{"label": "*", "property_filter": "$element.age < 60"}],
        "edge_filter": [
            {"label": "*", "property_filter": "$element.weight > 0.05"},
            {"label": "*",
             "property_filter": "$element.weight >= 0.1"},
        ],
    }
    got = sorted(tuple(r["path"]) for r in rings_with_filter(g, describe, 6).collect())
    # same oracle rules, no $message term and no label column needed
    vf = {v for v, _, age in _VERTS if age < 60}
    adj = {}
    for s, d, w in _EDGES:
        if s != d and s in vf and d in vf:
            adj.setdefault(s, []).append((d, w))
    out = []
    for start in sorted(vf):
        stack = [(start, [start], None)]
        while stack:
            cur, path, prev_w = stack.pop()
            for nxt, w in adj.get(cur, []):
                # both items are $message-free, so they gate every hop,
                # the first included
                ok = w > 0.05 and w >= 0.1
                if not ok:
                    continue
                if nxt == start and prev_w is not None:
                    out.append(tuple(path))
                elif nxt > start and nxt not in path:
                    stack.append((nxt, path + [nxt], w))
    assert got == sorted(out)
