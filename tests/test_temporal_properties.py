"""Property-based parity: asof_join / interval_join vs brute-force
Python oracles on randomized inputs (hypothesis).

The brute-force oracles re-state the CONTRACT independently of the
implementation: backward as-of = argmax over right ts <= left ts
(inclusive, max-struct tie collapse), forward = argmin over right ts >=
left ts, tolerance nulls far matches; interval join = the literal
double loop over (interval, point) pairs.

Spark-session startup is expensive, so each property runs a modest
number of examples with a fixed deadline-free profile; determinism of
draws comes from hypothesis' own seeding.
"""

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from incubator_hugegraph_computer_spark.functions.temporal import (
    asof_join,
    interval_join,
)

_key = st.integers(min_value=0, max_value=2)
_ts = st.integers(min_value=0, max_value=30)
_val = st.integers(min_value=0, max_value=9)

_left_rows = st.lists(st.tuples(_key, _ts), min_size=0, max_size=12)
_right_rows = st.lists(st.tuples(_key, _ts, _val), min_size=0, max_size=12)

_PROFILE = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)


def _brute_asof(left, right, direction, tolerance=None):
    """(k, ts) -> (val, matched_ts) per left row index."""
    out = []
    for k, lts in left:
        if direction == "backward":
            cand = [(rts, v) for (rk, rts, v) in right if rk == k and rts <= lts]
            best_ts = max((rts for rts, _ in cand), default=None)
        else:
            cand = [(rts, v) for (rk, rts, v) in right if rk == k and rts >= lts]
            best_ts = min((rts for rts, _ in cand), default=None)
        if best_ts is None:
            out.append((k, lts, None, None))
            continue
        # deterministic tie collapse: max payload among rows at best_ts
        v = max(v for rts, v in cand if rts == best_ts)
        if tolerance is not None and abs(lts - best_ts) > tolerance:
            out.append((k, lts, None, None))
        else:
            out.append((k, lts, v, best_ts))
    return sorted(out, key=lambda t: (t[0], t[1], repr(t)))


@given(left=_left_rows, right=_right_rows,
       direction=st.sampled_from(["backward", "forward"]),
       tolerance=st.sampled_from([None, 0, 3, 10]))
@_PROFILE
def test_asof_join_matches_bruteforce(spark, left, right, direction, tolerance):
    ldf = spark.createDataFrame(
        [(k, t) for k, t in left] or [(None, None)], "k long, ts long"
    )
    if not left:
        ldf = ldf.where(F.lit(False))
    rdf = spark.createDataFrame(
        [(k, t, v) for k, t, v in right] or [(None, None, None)],
        "k long, ts long, v long",
    )
    if not right:
        rdf = rdf.where(F.lit(False))
    if not right:
        return  # asof_join requires a payload column on a usable right side
    got = asof_join(
        ldf, rdf, on=["k"], left_ts="ts",
        direction=direction, tolerance_s=tolerance,
    )
    got_rows = sorted(
        ((r["k"], r["ts"], r["v_r"], r["ts_r"]) for r in got.collect()),
        key=lambda t: (t[0], t[1], repr(t)),
    )
    want = _brute_asof(left, right, direction, tolerance)
    assert got_rows == want


def _brute_interval(points, intervals):
    return sorted(
        (iv_i, p_i)
        for iv_i, (ik, s, e) in enumerate(intervals)
        for p_i, (pk, t) in enumerate(points)
        if ik == pk and s <= t <= e
    )


@given(
    points=st.lists(st.tuples(_key, _ts), min_size=0, max_size=10),
    intervals=st.lists(st.tuples(_key, _ts, _ts), min_size=0, max_size=8),
    bucket=st.sampled_from([1, 3, 7, 50]),
)
@_PROFILE
def test_interval_join_matches_bruteforce(spark, points, intervals, bucket):
    pdf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(points)] or [(None, None, None)],
        "p_i long, k long, ts long",
    )
    if not points:
        pdf = pdf.where(F.lit(False))
    idf = spark.createDataFrame(
        [(i, k, s, e) for i, (k, s, e) in enumerate(intervals)]
        or [(None, None, None, None)],
        "iv_i long, k long, start long, end long",
    )
    if not intervals:
        idf = idf.where(F.lit(False))
    got = interval_join(pdf, idf, on=["k"], point_ts="ts", bucket_s=bucket)
    got_pairs = sorted((r["iv_i"], r["p_i"]) for r in got.collect())
    assert got_pairs == _brute_interval(points, intervals)
