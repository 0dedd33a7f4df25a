"""Compare result dtypes between each oracle (DuckDB DESCRIBE) and the
Spark query schema, per column. The driver's hasher distinguishes dtypes
(DuckDB HUGEINT vs Spark bigint caused both historical hash failures),
so the local gate must see the same thing.

Canonical mapping: both type systems collapse to a family+width token;
any column whose tokens differ is reported. HUGEINT has no Spark
equivalent and is always a finding.

Usage: python tools/check_types.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from incubator_hugegraph_computer_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

_DUCK = {
    "TINYINT": "int8", "SMALLINT": "int16", "INTEGER": "int32",
    "BIGINT": "int64", "HUGEINT": "int128", "UTINYINT": "uint8",
    "USMALLINT": "uint16", "UINTEGER": "uint32", "UBIGINT": "uint64",
    "FLOAT": "float32", "DOUBLE": "float64", "VARCHAR": "str",
    "BOOLEAN": "bool", "BLOB": "binary", "DATE": "date",
    "TIMESTAMP": "timestamp",
}

_SPARK = {
    "tinyint": "int8", "smallint": "int16", "int": "int32",
    "bigint": "int64", "float": "float32", "double": "float64",
    "string": "str", "boolean": "bool", "binary": "binary",
    "date": "date", "timestamp": "timestamp", "timestamp_ntz": "timestamp",
}


def canon_duck(t: str) -> str:
    t = t.strip()
    m = re.fullmatch(r"(.+)\[\]", t)
    if m:
        return f"array<{canon_duck(m.group(1))}>"
    if t.startswith("DECIMAL"):
        return "decimal"
    return _DUCK.get(t, t.lower())


def canon_spark(t: str) -> str:
    t = t.strip()
    m = re.fullmatch(r"array<(.+)>", t)
    if m:
        return f"array<{canon_spark(m.group(1))}>"
    if t.startswith("decimal"):
        return "decimal"
    return _SPARK.get(t, t)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[4]", shuffle_partitions=4, app_name="typecheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    findings = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            sdf = fn(spark, sf_dir)
            stypes = {f.name: canon_spark(f.dataType.simpleString()) for f in sdf.schema.fields}
        except Exception as ex:
            findings.append((name, "*", f"spark error: {ex}"))
            continue
        try:
            desc = con.execute(f"DESCRIBE ({oracles[name]})").fetchall()
        except Exception as ex:
            findings.append((name, "*", f"duckdb error: {ex}"))
            continue
        otypes = {r[0]: canon_duck(r[1]) for r in desc}
        for col in sorted(set(stypes) | set(otypes)):
            s, o = stypes.get(col), otypes.get(col)
            if s != o:
                findings.append((name, col, f"spark={s} oracle={o}"))
    for name, col, msg in findings:
        print(f"MISMATCH {name}.{col}: {msg}")
    print("=" * 60)
    print(f"{len(findings)} dtype mismatches" if findings else "ALL TYPES MATCH")
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main())
