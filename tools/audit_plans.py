#!/usr/bin/env python
"""Scan every queries() entry's physical plan for scale red flags.

Flags, per query:

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` — all-pairs joins
  that explode at scale. A broadcast-NLJ is auto-whitelisted when its
  BUILD side is provably bounded at the plan level: a global (keys=[])
  aggregate (one row — PageRank-style in-plan scalars), a
  TakeOrdered/limit (k rows — IVF centroids), a literal ``Range`` /
  ``LocalTableScan`` / literal-array explode (parameter frames — LSH
  planes, gap-fill spine). Build sides bounded only by a CONTRACT the
  plan can't prove (a pushed filter selecting the query set) need an
  entry in ``WAIVED`` naming the contract; every other BNLJ is flagged.
- ``BatchEvalPython`` / ``PythonUDF`` outside ``ArrowEvalPython`` /
  ``MapInPandas`` / ``FlatMapGroupsInPandas`` — row-at-a-time Python in
  the plan (the Arrow nodes are the sanctioned vectorized path).
- ``Exchange SinglePartition`` feeding anything other than a final
  one-row aggregate / TakeOrdered-style collapse — a single-task stage
  over data that grows with input size.

Iterative BSP operators return localCheckpoint-materialized state, so
their *final* plan is a parallel scan; the per-superstep plan is audited
separately in PLANS.md. This tool is the breadth pass over the whole
queries() surface.

Usage: python tools/audit_plans.py [sf_dir] [query ...]
Prints one line per query; exits 1 if any un-whitelisted flag fires.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_string(df) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


# SinglePartition exchanges that are the minimal physical shape for the
# result (scalar aggregates, global sort of a k-row frame) — matched
# against the operator directly ABOVE the exchange in the formatted tree.
_SCALAR_PARENTS = re.compile(
    r"HashAggregate|SortAggregate|ObjectHashAggregate|TakeOrdered|CollectLimit|Sort"
)


# BNLJs whose build side is bounded by a query-level contract the plan
# cannot express — keep this list SHORT and name the bound.
WAIVED = {
    "emb_cosine_topk": "broadcast query set: vec_id < QUERY_MAX (≤5 rows by contract)",
    "emb_mips_topk": "broadcast query set: vec_id < QUERY_MAX (≤5 rows by contract)",
    "emb_mrl_topk": "broadcast query set: vec_id < QUERY_MAX (≤5 rows by contract)",
    "emb_ivf_trained_topk": (
        "broadcast sides are the trained k-means centroid frame "
        "(createDataFrame of K=8 driver rows from fit_kmeans_centroids) and "
        "the ≤QUERY_MAX query set — both parameter-sized by construction"
    ),
    "emb_ivf_recall": (
        "composition of emb_cosine_topk and emb_ivf_topk — its two BNLJs "
        "are those queries' already-waived ≤QUERY_MAX query-set broadcasts"
    ),
}

# build-side roots that bound the broadcast frame at the plan level
_BOUNDED_BUILD = re.compile(
    r"TakeOrderedAndProject\(limit=|CollectLimit|GlobalLimit|LocalTableScan"
    r"|Range \(\d|Generate explode\(org\.apache\.spark\.sql\.catalyst\.expressions\.Unsafe"
    r"|HashAggregate\(keys=\[\]"
)


def _prefix_len(line: str) -> int:
    return re.match(r"^[\s:+*-]*", line).end()


def _bnlj_flags(simple: str) -> list[str]:
    """Flag each BroadcastNestedLoopJoin whose BUILD-side subtree is NOT
    rooted (within its first few operators) in a plan-level-bounded
    frame (see ``_BOUNDED_BUILD``). Tree walk over the simple plan
    string: a node's subtree is the following lines with a longer marker
    prefix; its direct children sit at the minimal prefix within it."""
    lines = simple.split("\n")
    out = []
    for i, ln in enumerate(lines):
        m = re.search(r"BroadcastNestedLoopJoin Build(Right|Left)", ln)
        if not m:
            continue
        indent = _prefix_len(ln)
        sub: list[tuple[int, str]] = []
        for l2 in lines[i + 1:]:
            if l2.strip() and _prefix_len(l2) <= indent:
                break
            sub.append((_prefix_len(l2), l2))
        kids: list[list[str]] = []
        child_ind = min((ind for ind, l2 in sub if l2.strip()), default=None)
        for ind, l2 in sub:
            if ind == child_ind:
                kids.append([])
            if kids:
                kids[-1].append(l2)
        build = (kids[-1] if m.group(1) == "Right" else kids[0]) if kids else []
        # root-level check only (first 4 operators of the build subtree:
        # the exchange wrapper + the producing op ± a projection) — a
        # bounded node buried DEEP inside a growing build must not pass
        if not any(_BOUNDED_BUILD.search(l2) for l2 in build[:4]):
            out.append("BroadcastNestedLoopJoin")
    return out


def audit_one(df) -> list[str]:
    plan = plan_string(df)
    flags: list[str] = []
    if "CartesianProduct" in plan:
        flags.append("CartesianProduct")
    # Arrow-vectorized Python nodes are fine; row-wise BatchEvalPython is not.
    if "BatchEvalPython" in plan:
        flags.append("BatchEvalPython(row-wise UDF)")
    # formatted mode lists operators as "(N) OpName"; exchanges carry their
    # partitioning in the details section — fall back to simple/extended scan.
    simple = df._jdf.queryExecution().executedPlan().toString()
    flags.extend(_bnlj_flags(simple))
    for m in re.finditer(r"^(?P<indent>[\s:+*-]*)Exchange SinglePartition", simple, re.M):
        # find the nearest less-indented line above = the consumer operator
        upto = simple[: m.start()]
        lines = upto.rstrip("\n").split("\n")
        indent = len(m.group("indent"))
        parent = ""
        for ln in reversed(lines):
            stripped = re.match(r"^[\s:+*-]*", ln).end()
            if stripped < indent and ln.strip():
                parent = ln
                break
        if not _SCALAR_PARENTS.search(parent):
            flags.append(f"SinglePartition under [{parent.strip()[:60]}]")
    return flags


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from incubator_hugegraph_computer_spark.session import get_spark

    spark = get_spark(app_name="audit_plans")
    import __spark_entry__ as entry

    qs = entry.queries()
    bad = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            flags = audit_one(df)
        except Exception as exc:  # noqa: BLE001
            print(f"{name:32s} ERROR {type(exc).__name__}: {exc}")
            bad += 1
            continue
        if flags and name in WAIVED and all(f == "BroadcastNestedLoopJoin" for f in flags):
            print(f"{name:32s} ok (waived BNLJ: {WAIVED[name]})")
        elif flags:
            bad += 1
            print(f"{name:32s} FLAG  {'; '.join(flags)}")
        else:
            print(f"{name:32s} ok")
    print(f"\n{bad} flagged / errored")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
