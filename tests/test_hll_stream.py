"""Streaming HLL maintenance — register parity with one batch pass."""

import os
import time


def _write_chunks(spark, src, chunks, schema):
    src.mkdir()
    for i, part in enumerate(chunks):
        df = spark.createDataFrame(part, schema).coalesce(1)
        tmp = str(src / f"c{i}.tmp")
        df.write.mode("overwrite").parquet(tmp)
        fname = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dest = str(src / f"part-{i:05d}.parquet")
        os.rename(os.path.join(tmp, fname), dest)
        ts = time.time() + i
        os.utime(dest, (ts, ts))


def test_hll_stream_matches_batch(spark, tmp_path):
    from incubator_hugegraph_computer_spark.functions.sketches import hll_distinct
    from incubator_hugegraph_computer_spark.streaming.hll import (
        hll_estimates,
        read_hll,
        run_hll_stream,
    )

    rows = [(i, f"t{i % 3}", i % 37) for i in range(300)]
    chunks = [rows[:100], rows[100:200], rows[200:]]
    src = tmp_path / "events"
    _write_chunks(
        spark, src, chunks, "event_id long, event_type string, user_id long"
    )
    run_hll_stream(
        spark, str(src), str(tmp_path / "ck"), str(tmp_path / "hll")
    )
    regs = read_hll(spark, str(tmp_path / "hll"))
    streamed = {r["grp"]: r["est_distinct"]
                for r in hll_estimates(regs).collect()}
    batch_df = spark.createDataFrame(
        rows, "event_id long, event_type string, user_id long"
    )
    expected = {r["event_type"]: r["est_distinct"]
                for r in hll_distinct(batch_df, "user_id", ["event_type"]).collect()}
    assert streamed == expected


def test_hll_estimates_register_count_guards(spark):
    """ADVICE r4: the register count m rides in the state; a mixed or
    contradicting count must raise, never silently use the wrong alpha."""
    import pytest
    from incubator_hugegraph_computer_spark.streaming.hll import hll_estimates

    ok = spark.createDataFrame(
        [("a", 0, 3, 16), ("a", 1, 2, 16)], "grp string, j int, mv int, m int"
    )
    # persisted m drives the estimate without an explicit value
    assert hll_estimates(ok).collect()[0]["est_distinct"] > 0
    # explicit matching m is accepted
    assert hll_estimates(ok, m=16).collect()[0]["est_distinct"] > 0
    with pytest.raises(ValueError, match="contradicts"):
        hll_estimates(ok, m=32)
    mixed = spark.createDataFrame(
        [("a", 0, 3, 16), ("a", 1, 2, 32)], "grp string, j int, mv int, m int"
    )
    with pytest.raises(ValueError, match="mixed register counts"):
        hll_estimates(mixed)
    bare = ok.drop("m")
    with pytest.raises(ValueError, match="register count unknown"):
        hll_estimates(bare)
