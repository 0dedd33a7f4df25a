"""Stateful-streaming sessionization + IVF ANN tests."""

import shutil

from pyspark.sql import functions as F

from incubator_hugegraph_computer_spark.functions.similarity import (
    cosine_topk,
    ivf_topk,
)
from incubator_hugegraph_computer_spark.streaming.sessions import (
    sessionize_batch,
    sessionize_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def _key(r):
    return (r["user_id"], str(r["session_start"]), str(r["session_end"]),
            r["n_events"], round(r["sum_value"], 4))


def test_stream_sessionize_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization over an AvailableNow drain
    equals the batch window-function form: every session closed by a
    successor event must be emitted; each user's final (open) session is
    emitted iff the final watermark passed its close boundary."""
    src_dir = tmp_path / "in"
    src_dir.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src_dir / "events.parquet")
    events = spark.read.parquet(str(src_dir))
    gap_min = 30

    batch = sessionize_batch(events, gap_minutes=gap_min).collect()
    last_start = {}
    for r in batch:
        k = r["user_id"]
        if k not in last_start or r["session_start"] > last_start[k]:
            last_start[k] = r["session_start"]
    must = {_key(r) for r in batch if r["session_start"] != last_start[r["user_id"]]}
    maybe = {_key(r) for r in batch if r["session_start"] == last_start[r["user_id"]]}

    sessionize_stream(
        spark,
        str(src_dir),
        checkpoint_dir=str(tmp_path / "ck"),
        output_dir=str(tmp_path / "out"),
        gap_minutes=gap_min,
    )
    got = {_key(r) for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert must <= got, f"missing closed sessions: {list(must - got)[:3]}"
    assert got <= must | maybe, f"unexpected sessions: {list(got - (must | maybe))[:3]}"
    assert len(must) > 100  # non-trivial corpus


def test_stream_sessionize_late_events(spark, tmp_path):
    """A late event (above watermark) landing BEFORE the open session
    must extend session_start backwards when within gap, and become its
    own earlier session when beyond gap — matching the batch form."""
    import datetime as dt

    from incubator_hugegraph_computer_spark.streaming.sessions import (
        sessionize_stream,
    )

    indir, ck, outdir = (
        str(tmp_path / "lin"), str(tmp_path / "lck"), str(tmp_path / "lout")
    )

    def land(name, rows):
        df = spark.createDataFrame(
            [(u, dt.datetime(2024, 1, 1, h, m), 1.0) for u, h, m in rows],
            "user_id long, ts timestamp, value double",
        ).coalesce(1)
        import os as _os
        import time as _time

        tmp = str(tmp_path / (name + ".tmp"))
        df.write.mode("overwrite").parquet(tmp)
        _os.makedirs(indir, exist_ok=True)
        f = [x for x in _os.listdir(tmp) if x.endswith(".parquet")][0]
        dest = f"{indir}/{name}.parquet"
        _os.rename(f"{tmp}/{f}", dest)
        ts = _time.time() + int(name)
        _os.utime(dest, (ts, ts))

    # batch 1: user 1 at 12:00, user 2 at 12:00 (watermark held at 10:00
    # via a 2h watermark, so earlier events are NOT dropped)
    land("0", [(1, 12, 0), (2, 12, 0)])
    # batch 2: user 1 gets a late 11:45 (within 30min gap -> session_start
    # must move back); user 2 gets a late 10:00 (beyond gap -> its own
    # session, emitted); plus a 14:00 event per user to close sessions
    land("1", [(1, 11, 45), (2, 10, 0), (1, 14, 0), (2, 14, 0)])
    # batch 3 pushes the final watermark to 15:00 so every session above
    # is watermark-closed (close boundary = end + 30min <= 15:00); the
    # 17:00 sessions themselves stay unflushed — emission is strictly
    # watermark-driven, never eager (an eager emit of a successor-closed
    # session would split it if an on-time late event landed before it)
    land("2", [(1, 17, 0), (2, 17, 0)])
    sessionize_stream(
        spark, indir, ck, outdir,
        gap_minutes=30, watermark="2 hours", max_files_per_trigger=1,
    )
    got = {
        (r["user_id"], r["session_start"].strftime("%H:%M"),
         r["session_end"].strftime("%H:%M"), r["n_events"])
        for r in spark.read.parquet(outdir).collect()
    }
    assert (1, "11:45", "12:00", 2) in got  # start extended backwards
    assert (2, "10:00", "10:00", 1) in got  # separate earlier session
    assert (2, "12:00", "12:00", 1) in got
    assert (1, "14:00", "14:00", 1) in got  # closed once watermark passed
    assert not any(s == "17:00" for _, s, _, _ in got)  # not yet closed


def test_ivf_topk_recall_and_determinism(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, k=5).collect()
    approx = ivf_topk(emb, queries, k=5, n_centroids=16, n_probe=8).collect()
    exact_set = {(r["query_id"], r["vec_id"]) for r in exact}
    approx_set = {(r["query_id"], r["vec_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # embeddings are label-clustered; probing half the cells must find
    # most true neighbors
    assert recall >= 0.6, f"IVF recall {recall}"
    again = {(r["query_id"], r["vec_id"], round(r["score"], 9)) for r in
             ivf_topk(emb, queries, k=5, n_centroids=16, n_probe=8).collect()}
    first = {(r["query_id"], r["vec_id"], round(r["score"], 9)) for r in approx}
    assert first == again


def test_lsh_hot_bucket_cap(spark):
    """A saturated bucket is dropped when max_bucket_size is set: the
    degenerate all-equal vectors stop producing O(n^2) pairs, distinct
    vectors in small buckets are unaffected."""
    from pyspark.sql import functions as F

    from incubator_hugegraph_computer_spark.functions.similarity import (
        embedding_near_duplicates,
    )

    # 20 identical vectors (one hot bucket) + 2 identical outliers
    # (their own small bucket)
    rows = [(i, [1.0] * 8) for i in range(20)] + [(100, [-1.0] * 8), (101, [-1.0] * 8)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    uncapped = embedding_near_duplicates(emb, threshold=0.9, num_planes=4)
    assert uncapped.where(F.col("vec_a") < 100).count() == 20 * 19 // 2

    capped = embedding_near_duplicates(emb, threshold=0.9, num_planes=4, max_bucket_size=10)
    got = {(r["vec_a"], r["vec_b"]) for r in capped.collect()}
    assert got == {(100, 101)}  # hot bucket dropped, small bucket kept


def test_ivf_trained_centroids_recall(spark):
    """Trained (k-means) inverted lists should match or beat the
    lowest-id-centroid recall at the same probe budget on the
    label-clustered test embeddings."""
    from incubator_hugegraph_computer_spark.functions.similarity import (
        kmeans_centroids,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    exact = {(r["query_id"], r["vec_id"]) for r in cosine_topk(emb, queries, k=5).collect()}
    cents = kmeans_centroids(emb, k=16, iters=2).select(
        F.col("cid").alias("cent_id"), F.col("cv").alias("cvec")
    )
    trained = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk(emb, queries, k=5, n_probe=8, centroids=cents).collect()
    }
    naive = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk(emb, queries, k=5, n_centroids=16, n_probe=8).collect()
    }
    recall_t = len(exact & trained) / len(exact)
    recall_n = len(exact & naive) / len(exact)
    assert recall_t >= 0.6, f"trained IVF recall {recall_t}"
    assert recall_t >= recall_n - 0.05, (recall_t, recall_n)


def test_stream_sessionize_no_split_on_late_merge(spark, tmp_path):
    """Regression: a session already closed by a successor event must
    NOT be emitted until the watermark passes its close boundary — an
    on-time late event landing just before it must merge, yielding the
    single session the batch form reports (eager emission would split
    it into two)."""
    import datetime as dt
    import os as _os
    import time as _time

    from incubator_hugegraph_computer_spark.streaming.sessions import (
        sessionize_stream,
    )

    indir, ck, outdir = (
        str(tmp_path / "nin"), str(tmp_path / "nck"), str(tmp_path / "nout")
    )

    def land(name, rows):
        df = spark.createDataFrame(
            [(u, dt.datetime(2024, 1, 1, h, m), 1.0) for u, h, m in rows],
            "user_id long, ts timestamp, value double",
        ).coalesce(1)
        tmp = str(tmp_path / ("n" + name + ".tmp"))
        df.write.mode("overwrite").parquet(tmp)
        _os.makedirs(indir, exist_ok=True)
        f = [x for x in _os.listdir(tmp) if x.endswith(".parquet")][0]
        dest = f"{indir}/{name}.parquet"
        _os.rename(f"{tmp}/{f}", dest)
        ts = _time.time() + int(name)
        _os.utime(dest, (ts, ts))

    # batch 1: 10:00 and 12:00 -> [10:00] is successor-closed already
    land("0", [(1, 10, 0), (1, 12, 0)])
    # batch 2: on-time late 10:15 (watermark still 10:00) must MERGE
    land("1", [(1, 10, 15)])
    # batch 3: advance the watermark past every close boundary
    land("2", [(1, 17, 0)])
    sessionize_stream(
        spark, indir, ck, outdir,
        gap_minutes=30, watermark="2 hours", max_files_per_trigger=1,
    )
    got = {
        (r["session_start"].strftime("%H:%M"),
         r["session_end"].strftime("%H:%M"), r["n_events"])
        for r in spark.read.parquet(outdir).collect()
    }
    assert ("10:00", "10:15", 2) in got, got   # ONE merged session
    assert ("10:00", "10:00", 1) not in got    # no split emission
    assert ("10:15", "10:15", 1) not in got
