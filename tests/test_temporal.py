"""as-of join + time_bucket_gapfill (functions/temporal.py).

Ground truth for the as-of fixtures is hand-computed (and mirrors
pandas.merge_asof / DuckDB ASOF JOIN semantics: backward = greatest
right ts <= left ts, inclusive; forward = smallest right ts >= left
ts, inclusive; left-outer; tolerance nulls far matches).
"""

import datetime as dt

from pyspark.sql import functions as F

from incubator_hugegraph_computer_spark.functions.temporal import (
    asof_join,
    interval_join,
    time_bucket_gapfill,
)


def _sides(spark):
    left = spark.createDataFrame(
        [
            (1, 10, 5.0),   # matches right ts=10 (inclusive tie)
            (1, 12, 6.0),   # matches right ts=10
            (1, 3, 7.0),    # before every right row -> null
            (2, 100, 8.0),  # matches right ts=90
            (3, 50, 9.0),   # key with no right rows -> null
        ],
        "k long, ts long, lval double",
    )
    right = spark.createDataFrame(
        [
            (1, 10, "a"),
            (1, 10, "b"),   # tie on (k, ts): max-struct picks 'b'
            (1, 11, "c"),
            (2, 90, "d"),
            (2, 101, "e"),
        ],
        "k long, ts long, tag string",
    )
    return left, right


def test_asof_backward(spark):
    left, right = _sides(spark)
    out = asof_join(left, right, on=["k"], left_ts="ts")
    got = {r["ts"]: (r["tag_r"], r["ts_r"]) for r in out.collect()}
    assert out.count() == 5  # left-outer: every left row survives
    assert got[10] == ("b", 10)   # inclusive tie, deterministic max-struct
    assert got[12] == ("c", 11)
    assert got[3] == (None, None)
    assert got[100] == ("d", 90)
    assert got[50] == (None, None)


def test_asof_forward_and_tolerance(spark):
    left, right = _sides(spark)
    fwd = asof_join(left, right, on=["k"], left_ts="ts", direction="forward")
    got = {r["ts"]: (r["tag_r"], r["ts_r"]) for r in fwd.collect()}
    assert got[10] == ("b", 10)   # inclusive at equal ts
    assert got[12] == (None, None)  # nothing at/after 12 for k=1
    assert got[3] == ("b", 10)
    assert got[100] == ("e", 101)

    tol = asof_join(left, right, on=["k"], left_ts="ts", tolerance_s=2)
    got = {r["ts"]: (r["tag_r"], r["ts_r"]) for r in tol.collect()}
    assert got[12] == ("c", 11)       # |12-11| <= 2
    assert got[100] == (None, None)   # |100-90| > 2 -> nulled


def test_asof_rejects_bad_args(spark):
    left, right = _sides(spark)
    try:
        asof_join(left, right, on=["k"], direction="sideways")
        assert False, "expected ValueError"
    except ValueError:
        pass
    try:
        asof_join(left, right.select("k", "ts"), on=["k"])
        assert False, "expected ValueError (no payload)"
    except ValueError:
        pass


def test_asof_null_timestamps(spark):
    left = spark.createDataFrame(
        [(1, None, 1.0), (1, 15, 2.0)], "k long, ts long, lval double"
    )
    right = spark.createDataFrame(
        [(1, None, "nullts"), (1, 10, "a"), (1, 20, "b")], "k long, ts long, tag string"
    )
    for direction in ("backward", "forward"):
        out = asof_join(left, right, on=["k"], left_ts="ts", direction=direction)
        rows = {r["lval"]: (r["tag_r"], r["ts_r"]) for r in out.collect()}
        assert len(rows) == 2  # NULL-ts left row survives (left-outer) ...
        assert rows[1.0] == (None, None)  # ... but never matches
        # and the NULL-ts right row is never the match for anyone
        assert rows[2.0] == (("a", 10) if direction == "backward" else ("b", 20))


def test_interval_join_guards(spark):
    points = spark.createDataFrame([(1, 5, "p")], "k long, ts long, tag string")
    rev = spark.createDataFrame([(1, 20, 4, "R")], "k long, start long, end long, iv string")
    # reversed interval: zero rows, not a descending bucket explosion
    assert interval_join(points, rev, on=["k"], point_ts="ts", bucket_s=10).count() == 0
    clash = spark.createDataFrame([(1, 0, 9, "C")], "k long, start long, end long, tag string")
    try:
        interval_join(points, clash, on=["k"], point_ts="ts", bucket_s=10)
        assert False, "expected ValueError on shared non-key column 'tag'"
    except ValueError:
        pass


def test_interval_join_matches_range_semantics(spark):
    # numeric ts; bucket width 10 forces multi-bucket intervals
    points = spark.createDataFrame(
        [(1, 5, "p5"), (1, 19, "p19"), (1, 31, "p31"), (2, 7, "q7")],
        "k long, ts long, tag string",
    )
    intervals = spark.createDataFrame(
        [(1, 4, 20, "A"),   # spans buckets 0..2 -> catches 5 and 19
         (1, 19, 19, "B"),  # degenerate point interval, inclusive both ends
         (1, 21, 30, "C"),  # catches nothing (31 excluded)
         (2, 0, 100, "D")], # other key
        "k long, start long, end long, iv string",
    )
    out = interval_join(points, intervals, on=["k"], point_ts="ts", bucket_s=10)
    pairs = {(r["iv"], r["tag"]) for r in out.collect()}
    assert pairs == {("A", "p5"), ("A", "p19"), ("B", "p19"), ("D", "q7")}


def test_gapfill_fills_missing_buckets(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        ("a", t0, 1.0),
        ("a", t0 + dt.timedelta(hours=3), 2.0),  # hours 1,2 missing for a
        ("b", t0 + dt.timedelta(hours=1), 4.0),
    ]
    events = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = time_bucket_gapfill(events, bucket="hour").collect()
    # spine: 2 groups x 4 hourly buckets (00..03)
    assert len(out) == 8
    by = {(r["event_type"], r["bucket_start"].hour): r for r in out}
    assert by[("a", 0)]["n_events"] == 1 and by[("a", 0)]["sum_value"] == 1.0
    assert by[("a", 1)]["n_events"] == 0 and by[("a", 1)]["sum_value"] is None
    assert by[("a", 3)]["n_events"] == 1
    assert by[("b", 1)]["n_events"] == 1
    assert by[("b", 3)]["n_events"] == 0


def test_stream_asof_enrich_matches_batch(spark, tmp_path):
    """applyInPandasWithState as-of enrichment drained with AvailableNow
    (one batch over a static input) equals batch asof_join exactly."""
    import shutil

    from incubator_hugegraph_computer_spark.streaming.enrich import stream_asof_enrich

    src = tmp_path / "in"
    src.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", src / "events.parquet")
    events = spark.read.parquet(str(src))

    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("matched_value")
    )
    batch = asof_join(
        purchases, clicks, on=["user_id"], left_ts="ts", tolerance_s=3600
    )
    want = {
        r["event_id"]: (r["matched_value_r"], r["ts_r"]) for r in batch.collect()
    }

    stream_asof_enrich(
        spark,
        str(src),
        checkpoint_dir=str(tmp_path / "ck"),
        output_dir=str(tmp_path / "out"),
        tolerance_s=3600,
    )
    got_rows = spark.read.parquet(str(tmp_path / "out")).collect()
    got = {r["event_id"]: (r["matched_value"], r["matched_ts"]) for r in got_rows}
    assert set(got) == set(want)
    assert len(want) > 50
    mism = {k for k in want if got[k] != want[k]}
    assert not mism, f"{len(mism)} mismatches, e.g. {sorted(mism)[:3]}"
