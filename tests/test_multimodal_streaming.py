import pytest

from incubator_hugegraph_computer_spark.functions.multimodal import (
    extract_features,
    frame_sample,
    synthetic_media,
)
from incubator_hugegraph_computer_spark.streaming.events import (
    stream_windowed_event_counts,
    windowed_event_counts,
)


def test_multimodal_feature_plumbing(spark):
    media = synthetic_media(spark, 10, kind="image")
    feats = extract_features(media, feature_dim=8).collect()
    assert len(feats) == 10
    for r in feats:
        assert len(r["feature"]) == 8
        assert r["n_bytes"] == 64
    # deterministic: same seed → same features
    again = extract_features(synthetic_media(spark, 10, kind="image"), feature_dim=8).collect()
    assert sorted(map(str, feats)) == sorted(map(str, again))


def test_multimodal_unknown_kind_raises(spark):
    from pyspark.sql import functions as F

    media = synthetic_media(spark, 2).withColumn("kind", F.lit("hologram"))
    with pytest.raises(Exception, match="no decoder"):
        extract_features(media).collect()


def test_frame_sampling(spark):
    media = synthetic_media(spark, 3, kind="video")
    frames = frame_sample(media, every_nth=2).collect()
    # 64-byte payload = 4 frames of 16 bytes; every 2nd → frames 0 and 2
    per_media = {}
    for r in frames:
        per_media.setdefault(r["media_id"], []).append(r["frame_no"])
    assert all(sorted(v) == [0, 2] for v in per_media.values())
    assert all(len(r["frame"]) == 16 for r in frames)


def test_resize_integer_pooling(spark):
    """resize() mean-pools with integer floor division — verify against
    a NumPy replay of the same pooling, including the short tail block."""
    import numpy as np

    from incubator_hugegraph_computer_spark.functions.multimodal import resize

    media = synthetic_media(spark, 5, kind="image")
    rows = {r["media_id"]: r for r in resize(media, factor=6).collect()}
    assert len(rows) == 5
    for mid, r in rows.items():
        src = np.random.default_rng(42 + mid).integers(0, 256, 64, dtype=np.uint8)
        idx = np.arange(0, 64, 6)
        sums = np.add.reduceat(src.astype(np.int64), idx)
        counts = np.diff(np.append(idx, 64))
        expect = (sums // counts).astype(np.uint8).tobytes()
        assert bytes(r["payload"]) == expect
        assert r["meta"]["width"] == 11  # ceil(64/6)
        assert r["meta"]["height"] == 1
        assert r["kind"] == "image"

    with pytest.raises(ValueError, match="factor"):
        resize(media, factor=0)


def test_streaming_matches_batch(spark, tmp_path):
    """AvailableNow streaming over the events table produces the same
    windowed aggregation as the batch query (append-mode finalized
    windows; watermark far past event time so all windows close)."""
    import shutil

    src_dir = tmp_path / "in"
    src_dir.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", src_dir / "events.parquet")
    events = spark.read.parquet(str(src_dir))
    batch = windowed_event_counts(events, "1 hour")
    stream_windowed_event_counts(
        spark,
        str(src_dir),
        checkpoint_dir=str(tmp_path / "ck"),
        output_dir=str(tmp_path / "out"),
        window="1 hour",
        watermark="0 seconds",
    )
    got = spark.read.parquet(str(tmp_path / "out"))
    # append mode emits only windows the final watermark closed: the last
    # open window (containing max event ts) is correctly withheld
    from pyspark.sql import functions as F

    max_ts = events.agg(F.max("ts")).first()[0]
    closed = batch.where(
        F.col("window_start") + F.expr("INTERVAL 1 HOUR") <= F.lit(max_ts)
    )
    b = {tuple(map(str, r)) for r in closed.collect()}
    g = {tuple(map(str, r)) for r in got.collect()}
    assert g == b
    assert len(g) > 0


def test_streaming_watermark_drops_late_data(spark, tmp_path):
    """Late rows behind the persisted watermark are dropped on resume:
    run 1 closes the 09:00 window (watermark = max_ts - 1h), run 2 then
    replays a 09:40 straggler plus a fresh event — the straggler must
    NOT reopen the already-emitted window, and the checkpointed stream
    picks up exactly where it left off."""
    import datetime as dt

    from incubator_hugegraph_computer_spark.streaming.events import (
        stream_windowed_event_counts,
    )

    indir, ckpt, outdir = (
        str(tmp_path / "in"), str(tmp_path / "ck"), str(tmp_path / "out")
    )

    def write_batch(rows):
        df = spark.createDataFrame(
            [(dt.datetime(2024, 1, 1, h, m), "click", 1.0) for h, m in rows],
            "ts timestamp, event_type string, value double",
        )
        df.write.mode("append").parquet(indir)

    # run 1: 09:30 event + 12:00 event -> watermark 11:00 closes 09-10
    write_batch([(9, 30), (12, 0)])
    stream_windowed_event_counts(spark, indir, ckpt, outdir, watermark="1 hour")
    out1 = {
        r["window_start"].hour: r["n_events"]
        for r in spark.read.parquet(outdir).collect()
    }
    assert out1 == {9: 1}

    # run 2 (same checkpoint): a 09:40 straggler (behind the persisted
    # watermark -> dropped) + a 14:00 event that closes the 12-13 window
    write_batch([(9, 40), (14, 0)])
    stream_windowed_event_counts(spark, indir, ckpt, outdir, watermark="1 hour")
    out2 = {
        r["window_start"].hour: r["n_events"]
        for r in spark.read.parquet(outdir).collect()
    }
    assert out2 == {9: 1, 12: 1}  # 09-10 still 1: the straggler was dropped
