#!/usr/bin/env python
"""Scan every queries() entry's physical plan for scale red flags.

Flags, per query:

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` — all-pairs joins
  that explode at scale (broadcast-NLJ is tolerated only when the build
  side is a literal one-row/constant frame; we report it and eyeball).
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


def audit_one(df) -> list[str]:
    plan = plan_string(df)
    flags: list[str] = []
    if "CartesianProduct" in plan:
        flags.append("CartesianProduct")
    if "BroadcastNestedLoopJoin" in plan:
        flags.append("BroadcastNestedLoopJoin")
    # Arrow-vectorized Python nodes are fine; row-wise BatchEvalPython is not.
    if "BatchEvalPython" in plan:
        flags.append("BatchEvalPython(row-wise UDF)")
    # formatted mode lists operators as "(N) OpName"; exchanges carry their
    # partitioning in the details section — fall back to simple/extended scan.
    simple = df._jdf.queryExecution().executedPlan().toString()
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
        if flags:
            bad += 1
            print(f"{name:32s} FLAG  {'; '.join(flags)}")
        else:
            print(f"{name:32s} ok")
    print(f"\n{bad} flagged / errored")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
