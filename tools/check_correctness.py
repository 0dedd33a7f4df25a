"""Local stand-in for the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB over the same
sf dir; compare row count, column names, and exact (order-insensitive)
values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
       python tools/check_correctness.py [sf_dir] --sample N [seed]

``--sample N seed`` checks a seeded random N-key subset of the full
registry — the local mirror of the driver's rotating 50-key window, so
breadth beyond the window stays exercised between rounds (VERDICT r3
directive #9). The chosen keys print first for the audit trail.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from incubator_hugegraph_computer_spark.session import get_spark
from tools.check_types import canon_duck, canon_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            v = 0.0  # -0.0 formats as '-0.000000' and would mismatch +0.0
        return f"{v:.6f}"
    return str(v)


def rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(norm(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    rest = sys.argv[2:]
    sample_n, sample_seed = None, 0
    if rest and rest[0] == "--sample":
        if len(rest) < 2:
            sys.exit("--sample needs a count: --sample N [seed]")
        sample_n = int(rest[1])
        sample_seed = int(rest[2]) if len(rest) > 2 else 0
        rest = []
    only = set(rest)
    spark = get_spark(master="local[8]", shuffle_partitions=8, app_name="correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name must not produce a zero-query 'ALL PASS'
        sys.exit(f"unknown queries: {sorted(unknown)}")
    if sample_n is not None:
        import random

        keys = sorted(qs)
        only = set(random.Random(sample_seed).sample(keys, min(sample_n, len(keys))))
        print(f"SAMPLE n={len(only)} seed={sample_seed}: {sorted(only)}")
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            stypes = {f.name: canon_spark(f.dataType.simpleString()) for f in sdf.schema.fields}
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error {type(ex).__name__}: {ex}")
            failed.append(name)
            continue
        spark_sec = time.monotonic() - t0
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows={len(srows)}, {spark_sec:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error {type(ex).__name__}: {ex}")
            failed.append(name)
            continue
        ok_cols = sorted(scols) == sorted(ocols)
        # the driver's hasher sees dtypes (DuckDB HUGEINT vs Spark bigint
        # broke 2 rounds of hashes) — so the local gate must compare them too
        otypes = {}
        try:
            otypes = {
                r[0]: canon_duck(r[1])
                for r in con.execute(f"DESCRIBE ({oracles[name]})").fetchall()
            }
        except Exception:
            pass
        type_mismatch = [
            f"{c}: spark={stypes.get(c)} oracle={otypes.get(c)}"
            for c in scols
            if c in otypes and stypes.get(c) != otypes.get(c)
        ]
        s_set, o_set = rows_to_set(scols, srows), rows_to_set(ocols, orows)
        ok_vals = s_set == o_set
        if type_mismatch:
            failed.append(name)
            print(f"FAIL {name}: dtype mismatch {type_mismatch}")
            continue
        if ok_cols and ok_vals:
            print(f"PASS {name}: rows={len(srows)} ({spark_sec:.1f}s)")
        else:
            failed.append(name)
            print(
                f"FAIL {name}: cols_match={ok_cols} spark_cols={sorted(scols)} "
                f"oracle_cols={sorted(ocols)} rows={len(srows)}/{len(orows)}"
            )
            if ok_cols:
                extra_s = [k for k in s_set if s_set[k] != o_set.get(k, 0)][:3]
                extra_o = [k for k in o_set if o_set[k] != s_set.get(k, 0)][:3]
                print(f"  spark-only sample: {extra_s}")
                print(f"  oracle-only sample: {extra_o}")
    print("=" * 60)
    print(f"failed: {failed}" if failed else "ALL PASS")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
