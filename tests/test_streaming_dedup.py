"""Streaming exact dedup == batch exact dedup (first-seen-wins)."""

import os
import time

from pyspark.sql import functions as F

from incubator_hugegraph_computer_spark.streaming.dedup import run_dedup_stream


def test_stream_dedup_matches_batch(spark, tmp_path):
    # 40 docs, every 4th a duplicate of doc (i - 4): 10 distinct texts
    # appear 4x each. Fed in doc_id order (one file per 10 docs, mod
    # times increasing) the stream must keep exactly min(doc_id) per
    # distinct text.
    rows = [(i, f"document body number {i % 10}") for i in range(40)]
    src = tmp_path / "src"
    src.mkdir()
    for chunk in range(4):
        part = rows[chunk * 10 : (chunk + 1) * 10]
        df = spark.createDataFrame(part, "doc_id long, text string").coalesce(1)
        pdir = str(src / f"chunk{chunk}.parquet")
        df.write.mode("overwrite").parquet(pdir + ".tmp")
        # single part file -> rename into the source dir with increasing mtime
        fname = [
            f for f in os.listdir(pdir + ".tmp") if f.endswith(".parquet")
        ][0]
        dest = str(src / f"part-{chunk:05d}.parquet")
        os.rename(os.path.join(pdir + ".tmp", fname), dest)
        ts = time.time() + chunk  # strictly increasing arrival order
        os.utime(dest, (ts, ts))

    run_dedup_stream(
        spark, str(src), str(tmp_path / "ck"), str(tmp_path / "out"),
        max_files_per_trigger=1,
    )
    got = {
        (r["doc_id"], r["h"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }

    batch = (
        spark.read.parquet(str(src))
        .withColumn("h", F.md5("text"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    want = {(r["doc_id"], r["h"]) for r in batch.collect()}
    assert got == want
    assert len(got) == 10  # one survivor per distinct text


def test_windowed_dedup_bounds_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark suppresses close-together dups but
    re-admits a copy arriving after the watermark has passed."""
    from incubator_hugegraph_computer_spark.streaming.dedup import (
        dedup_stream_windowed,
    )

    src = tmp_path / "wsrc"
    src.mkdir()
    base = 1_700_000_000
    # batch 1: doc 0 at t0 and its dup 1 at t0+10min (inside watermark
    # -> suppressed); batch 2 advances the watermark to t0+2h (doc 3 at
    # t0+3h); batch 3 then RUNS with that watermark and evicts the
    # expired entry (expiry t0+1h10m) at batch end — eviction happens
    # after the in-batch dedup check, so the re-admitted duplicate must
    # arrive one batch after the watermark crossing; batch 4: dup 2 is
    # re-admitted.
    batches = [
        [(0, "same text", base), (1, "same text", base + 600)],
        [(3, "other", base + 3 * 3600)],
        [(4, "another", base + 3 * 3600 + 30)],
        [(2, "same text", base + 3 * 3600 + 60)],
    ]
    for i, part in enumerate(batches):
        df = spark.createDataFrame(part, "doc_id long, text string, epoch long")
        pdir = str(src / f"b{i}.tmp")
        df.coalesce(1).write.mode("overwrite").parquet(pdir)
        fname = [f for f in os.listdir(pdir) if f.endswith(".parquet")][0]
        dest = str(src / f"part-{i:05d}.parquet")
        os.rename(os.path.join(pdir, fname), dest)
        ts = time.time() + i
        os.utime(dest, (ts, ts))

    schema = "doc_id long, text string, epoch long"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withColumn("ts", F.col("epoch").cast("timestamp"))
    )
    (
        dedup_stream_windowed(stream, ts_col="ts", watermark="1 hour")
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "wout"))
        .option("checkpointLocation", str(tmp_path / "wck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = sorted(
        r["doc_id"] for r in spark.read.parquet(str(tmp_path / "wout")).collect()
    )
    # 0 survives, 1 suppressed (within watermark), 2 re-admitted after
    # state eviction, 3 and 4 distinct texts
    assert got == [0, 2, 3, 4]


def test_neardup_stream_matches_sequential_oracle(spark, tmp_path):
    """Streaming near-dup ingestion: survivors == greedy sequential
    dedup (no match vs earlier survivors; no lower-id match in-batch)."""
    from incubator_hugegraph_computer_spark.streaming.dedup import (
        read_survivors,
        run_neardup_stream,
    )

    base_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    base_b = "one two three four five six seven eight nine ten eleven"
    base_c = "spark shuffle partition broadcast join aggregate scan filter sort window"
    # batch 0: a, b, and an exact in-batch dup of a (doc 2 dies in-batch)
    # batch 1: dup of a (dies vs index), c (novel), dup of b (dies vs index)
    # batch 2: dup of c (dies vs index), novel d
    batches = [
        [(0, base_a), (1, base_b), (2, base_a)],
        [(10, base_a), (11, base_c), (12, base_b)],
        [(20, base_c), (21, "completely novel closing text about bsp graph engines and supersteps")],
    ]
    src = tmp_path / "nsrc"
    src.mkdir()
    for k, part in enumerate(batches):
        df = spark.createDataFrame(part, "doc_id long, text string").coalesce(1)
        pdir = str(src / f"b{k}.tmp")
        df.write.mode("overwrite").parquet(pdir)
        fname = [f for f in os.listdir(pdir) if f.endswith(".parquet")][0]
        dest = str(src / f"part-{k:05d}.parquet")
        os.rename(os.path.join(pdir, fname), dest)
        ts = time.time() + k
        os.utime(dest, (ts, ts))

    out = str(tmp_path / "survivors")
    run_neardup_stream(
        spark, str(src), str(tmp_path / "nck"), out, threshold=0.5,
        max_files_per_trigger=1,
    )
    got = sorted(r["doc_id"] for r in read_survivors(spark, out).collect())
    assert got == [0, 1, 11, 21]


def test_neardup_stream_restart_continues_index(spark, tmp_path):
    """Restarting the stream (same checkpoint) after new files land must
    dedup the new batch against survivors from the PREVIOUS run — the
    side-table index persists across restarts."""
    from incubator_hugegraph_computer_spark.streaming.dedup import (
        read_survivors,
        run_neardup_stream,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    src = tmp_path / "rsrc"
    src.mkdir()

    def land(k, part):
        df = spark.createDataFrame(part, "doc_id long, text string").coalesce(1)
        pdir = str(src / f"b{k}.tmp")
        df.write.mode("overwrite").parquet(pdir)
        fname = [f for f in os.listdir(pdir) if f.endswith(".parquet")][0]
        dest = str(src / f"part-{k:05d}.parquet")
        os.rename(os.path.join(pdir, fname), dest)
        ts = time.time() + k
        os.utime(dest, (ts, ts))

    out, ck = str(tmp_path / "rsurv"), str(tmp_path / "rck")
    land(0, [(0, base), (1, "totally unrelated first-run text about executors")])
    run_neardup_stream(spark, str(src), ck, out, threshold=0.5)
    assert sorted(r["doc_id"] for r in read_survivors(spark, out).collect()) == [0, 1]

    # second run: one dup of a run-1 survivor, one novel doc
    land(1, [(10, base), (11, "fresh second-run content about checkpoint resume")])
    run_neardup_stream(spark, str(src), ck, out, threshold=0.5)
    got = sorted(r["doc_id"] for r in read_survivors(spark, out).collect())
    assert got == [0, 1, 11]  # 10 died against the restored index

    # a half-written (uncommitted) batch attempt — data subdir present,
    # no marker — must be invisible to corpus readers
    spark.createDataFrame(
        [(99, "phantom uncommitted doc")], "doc_id long, text string"
    ).write.mode("overwrite").parquet(out + "/batch-99")
    got2 = sorted(r["doc_id"] for r in read_survivors(spark, out).collect())
    assert got2 == [0, 1, 11]
