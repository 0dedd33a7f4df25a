"""Count-min sketch: exactness bounds, determinism, stream==batch."""

import os
import time

from pyspark.sql import functions as F

from incubator_hugegraph_computer_spark.functions.sketches import (
    cms_build,
    cms_estimate,
    heavy_hitters,
)


def _events(spark, n=300):
    # zipf-ish: key 'k0' hot, long tail
    rows = [(i, f"k{min(i % 30, i % 7)}") for i in range(n)]
    return spark.createDataFrame(rows, "event_id long, event_type string")


def test_cms_overestimates_never_under(spark):
    df = _events(spark)
    exact = {r["event_type"]: r["cnt"] for r in
             df.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    est = {r["key"]: r["est"] for r in
           cms_estimate(cms_build(df, "event_type"), df, "event_type").collect()}
    assert set(est) == set(exact)
    for k, e in est.items():
        assert e >= exact[k]


def test_cms_exact_when_wide(spark):
    # width >> distinct keys and depth 4 -> collisions essentially
    # impossible on 7 keys x 4 rows of md5
    df = _events(spark)
    hh = heavy_hitters(df, "event_type", k=100, width=4096).collect()
    assert all(r["est"] == r["exact"] for r in hh)


def test_cms_cell_count_bounded(spark):
    df = _events(spark, 500)
    cms = cms_build(df, "event_type", depth=4, width=64)
    assert cms.count() <= 4 * 64
    # total mass per row == n
    per_row = {r["r"]: r["s"] for r in
               cms.groupBy("r").agg(F.sum("cnt").alias("s")).collect()}
    assert all(v == 500 for v in per_row.values())


def test_heavy_hitters_order(spark):
    df = _events(spark)
    hh = heavy_hitters(df, "event_type", k=3, width=4096).collect()
    ests = [r["est"] for r in hh]
    assert ests == sorted(ests, reverse=True)
    assert len(hh) == 3


def test_cms_stream_matches_batch(spark, tmp_path):
    from incubator_hugegraph_computer_spark.streaming.heavy_hitters import (
        read_cms,
        run_cms_stream,
    )

    rows = [(i, f"k{i % 11}") for i in range(240)]
    src = tmp_path / "events"
    src.mkdir()
    for chunk in range(3):
        part = rows[chunk * 80 : (chunk + 1) * 80]
        df = spark.createDataFrame(part, "event_id long, event_type string").coalesce(1)
        pdir = str(src / f"chunk{chunk}.parquet")
        df.write.mode("overwrite").parquet(pdir + ".tmp")
        fname = [f for f in os.listdir(pdir + ".tmp") if f.endswith(".parquet")][0]
        dest = str(src / f"part-{chunk:05d}.parquet")
        os.rename(os.path.join(pdir + ".tmp", fname), dest)
        ts = time.time() + chunk
        os.utime(dest, (ts, ts))

    run_cms_stream(
        spark, str(src), str(tmp_path / "ck"), str(tmp_path / "cms"), width=64
    )
    streamed = {(r.r, r.col): r.cnt
                for r in read_cms(spark, str(tmp_path / "cms")).collect()}
    batch = spark.createDataFrame(rows, "event_id long, event_type string")
    expected = {(r.r, r.col): r.cnt
                for r in cms_build(batch, "event_type", width=64).collect()}
    assert streamed == expected
