"""Driver-contract smoke: entry() runs and yields rows with a stable
schema; queries()/oracle_sql() keys line up. (Full value-parity vs
DuckDB is exercised by tools/check_correctness.py and the driver.)"""

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["id", "rank"]
    ranks = [r["rank"] for r in rows]
    assert abs(sum(ranks) - 1.0) < 1e-3  # rounded to 6dp, mass ≈ 1


def test_queries_oracle_alignment(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 20
    # every oracle key has a query
    assert set(oracles).issubset(set(qs))


def test_sample_query_runs(spark):
    qs = entrymod.queries()
    df = qs["graph_degree"](spark, "/root/testdata/sf0.001")
    assert df.count() > 0
    assert sorted(df.columns) == ["degree", "id"]
