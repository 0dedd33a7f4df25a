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


def test_bloom_no_false_negatives(spark):
    from incubator_hugegraph_computer_spark.functions.sketches import (
        bloom_build,
        bloom_probe,
    )

    members = spark.createDataFrame(
        [(f"m{i}",) for i in range(50)], "key string"
    )
    others = spark.createDataFrame(
        [(f"x{i}",) for i in range(200)], "key string"
    )
    bloom = bloom_build(members, "key", m_bits=4096, k_hashes=4)
    got = {r["key"]: r["maybe_member"]
           for r in bloom_probe(bloom, members.unionAll(others), "key",
                                m_bits=4096, k_hashes=4).collect()}
    # one-sided: every member flagged
    assert all(got[f"m{i}"] for i in range(50))
    # fp rate tiny at this load (50*4/4096 bits set -> ~ (0.047)^4)
    fps = sum(1 for i in range(200) if got[f"x{i}"])
    assert fps <= 2


def test_bloom_deterministic(spark):
    from incubator_hugegraph_computer_spark.functions.sketches import bloom_build

    keys = spark.createDataFrame([(f"k{i}",) for i in range(40)], "key string")
    a = sorted(r["bit"] for r in bloom_build(keys, "key", m_bits=512).collect())
    b = sorted(r["bit"] for r in bloom_build(keys, "key", m_bits=512).collect())
    assert a == b and len(a) <= 4 * 40
