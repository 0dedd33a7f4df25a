"""Temporal operators over event tables: as-of join and gap-filled
time buckets.

The reference engine is batch-graph-only (SURVEY §2.9) — these are the
Spark-native temporal primitives an event/training-data pipeline needs
(the ``pandas.merge_asof`` and TimescaleDB ``time_bucket_gapfill``
equivalents), built to the same scale contract as the rest of the
engine: key-partitioned shuffles only, no range-explosion joins, no
per-row Python.

As-of join physical shape (the part Spark lacks as a built-in): a
naive implementation is a range join (``l.key = r.key AND r.ts <=
l.ts`` + argmax), which Catalyst executes as a broadcast-nested-loop
or a sort-merge with per-row range scans — quadratic in rows-per-key
and a non-starter at 100 TB. The scalable plan used here is the
union-tag merge: tag both sides, union, ONE hash-shuffle on the join
keys, sort within each partition by (ts, side), and carry the last
seen right-side payload forward with a running ``last(..,
ignorenulls)`` window. Cost = one shuffle + one in-partition sort of
|L|+|R| rows, independent of key skew in the match pattern (a hub key
costs its own rows, never |L_key| x |R_key|).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    direction: str = "backward",
    tolerance_s: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """As-of join: for every left row, attach the payload of the single
    right row with the greatest ``right_ts <= left_ts`` (``backward``,
    inclusive — DuckDB ``ASOF JOIN``/pandas ``merge_asof`` semantics)
    or the smallest ``right_ts >= left_ts`` (``forward``) within the
    same ``on`` key group. Left rows without a match keep NULL payload
    (left-outer semantics).

    ``tolerance_s`` (seconds, compared on the timestamp cast to epoch
    double — works for numeric ts columns too) nulls the payload of
    matches farther than the tolerance, exactly like ``merge_asof``'s
    ``tolerance``.

    Determinism: multiple right rows tied on (key, ts) are collapsed
    FIRST to one row per (key, ts) by max-struct over the payload
    columns, so the matched payload never depends on partition order.

    Output: every left column, then each right payload column renamed
    ``<col><suffix>``, then ``<right_ts><suffix>`` (the matched
    timestamp, NULL when unmatched/out-of-tolerance).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    keys = list(on)
    rts = right_ts or left_ts
    payload = [c for c in right.columns if c not in set(keys) | {rts}]
    if not payload:
        raise ValueError("right side has no payload columns besides keys/timestamp")

    # NULL-ts right rows can never be "the most recent" of anything —
    # drop them up front (a NULL _ats right row would advance _mp but
    # not _mts, pairing one row's payload with another's timestamp).
    # NULL-ts left rows stay (left-outer) but always get a NULL match.
    r1 = (
        right.where(F.col(rts).isNotNull())
        .groupBy(*keys, F.col(rts).alias("_ats"))
        .agg(F.max(F.struct(*payload)).alias("_p"))
    )
    lt = (
        left.withColumn("_ats", F.col(left_ts))
        .withColumn("_side", F.lit(1))
    )
    rt = r1.withColumn("_side", F.lit(0))
    both = lt.unionByName(rt, allowMissingColumns=True)

    # backward: at equal ts the right row must sort BEFORE the left row
    # so the match is inclusive (l.ts >= r.ts). forward: reverse the ts
    # order; right still first at equal ts => smallest r.ts >= l.ts.
    order = [F.col("_ats").asc(), F.col("_side").asc()] if direction == "backward" else [
        F.col("_ats").desc(), F.col("_side").asc()
    ]
    w = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    matched = both.select(
        "*",
        F.last("_p", ignorenulls=True).over(w).alias("_mp"),
        F.last(F.when(F.col("_side") == 0, F.col("_ats")), ignorenulls=True).over(w).alias("_mts"),
    )

    ok: Column = F.col("_mts").isNotNull() & F.col("_ats").isNotNull()
    if tolerance_s is not None:
        # exact integer microseconds for timestamps (same rule as
        # interval_join) — double-epoch seconds carry ~1e-7 s error at
        # 2024 epochs, enough to flip a boundary-exact tolerance compare
        tname = both.schema["_ats"].dataType.typeName()
        a_num, scale = _ts_num(F.col("_ats"), tname)
        m_num, _ = _ts_num(F.col("_mts"), tname)
        diff = F.abs(a_num - m_num)
        ok = ok & (diff <= F.lit(tolerance_s * scale))

    out_cols = [F.col(c) for c in left.columns]
    out_cols += [
        F.when(ok, F.col("_mp")[c]).alias(f"{c}{suffix}") for c in payload
    ]
    out_cols.append(F.when(ok, F.col("_mts")).alias(f"{rts}{suffix}"))
    return matched.where(F.col("_side") == 1).select(*out_cols)


def _ts_num(c: Column, dtype_name: str) -> tuple[Column, int]:
    """Numeric form of a timestamp-ish column + its per-second scale.
    Timestamps become exact integer microseconds (no double rounding at
    interval boundaries); numeric ts columns pass through as double."""
    if dtype_name.startswith("timestamp"):
        return F.unix_micros(c.cast("timestamp_ltz")), 1_000_000
    return c.cast("double"), 1


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_s: int = 3600,
) -> DataFrame:
    """Point-in-interval join: every (interval, point) pair with
    ``start <= point_ts <= end`` within the same key group — WITHOUT a
    range join (Catalyst executes non-equi range predicates as a
    nested-loop or an equi-join whose per-key fan-out is |points_key| x
    |intervals_key|; with hub keys that is quadratic).

    Physical shape: explode each interval into the fixed-width time
    buckets it covers (``sequence`` over bucket ordinals — fan-out =
    ceil(duration / bucket_s) + 1 rows per interval, pick ``bucket_s``
    near the typical interval length), equi-join on (keys, bucket),
    post-filter exact containment. Each point lives in exactly ONE
    bucket, so no post-join dedup is needed. Timestamp containment is
    compared in exact integer microseconds — no double-epoch boundary
    rounding.

    Inner semantics (only matched pairs). For left-outer aggregates
    ("0 points in this interval"), aggregate this result and join it
    back onto the interval table — cheaper than manufacturing NULL
    pair-rows here.
    """
    keys = list(on)
    overlap = (set(points.columns) & set(intervals.columns)) - set(keys)
    if overlap:
        raise ValueError(
            f"points and intervals share non-key columns {sorted(overlap)} — "
            "rename one side to keep the join output unambiguous"
        )
    p_num, p_scale = _ts_num(F.col(point_ts), points.schema[point_ts].dataType.typeName())
    s_num, s_scale = _ts_num(F.col(start_col), intervals.schema[start_col].dataType.typeName())
    e_num, e_scale = _ts_num(F.col(end_col), intervals.schema[end_col].dataType.typeName())
    if p_scale != s_scale or s_scale != e_scale:
        raise ValueError("points, start and end must use the same ts type family")
    width = F.lit(bucket_s * p_scale)

    pts = points.withColumn("_tn", p_num).withColumn(
        "_bkt", F.floor(F.col("_tn") / width)
    )
    lo_b, hi_b = F.floor(F.col("_sn") / width), F.floor(F.col("_en") / width)
    ivs = (
        intervals.withColumn("_sn", s_num)
        .withColumn("_en", e_num)
        # a reversed interval (end < start) contributes zero rows instead
        # of a silent descending bucket sequence (Spark's default step -1)
        .withColumn(
            "_bkt",
            F.explode(
                F.when(F.col("_sn") <= F.col("_en"), F.sequence(lo_b, hi_b)).otherwise(
                    F.array().cast("array<bigint>")
                )
            ),
        )
    )
    contained = F.col("_tn").between(F.col("_sn"), F.col("_en"))
    out = ivs.join(pts, keys + ["_bkt"]).where(contained)
    return out.drop("_tn", "_bkt", "_sn", "_en")


def time_bucket_gapfill(
    events: DataFrame,
    bucket: str = "hour",
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-(group, time-bucket) counts and sums with EVERY bucket in the
    observed [min, max] range present for every group — missing buckets
    filled with ``n_events = 0`` and NULL ``sum_value`` (TimescaleDB
    ``time_bucket_gapfill`` semantics).

    ``bucket`` is a ``date_trunc`` unit ('hour' | 'day' | 'week' | ...).

    Physical shape: ONE pass over the events (a map-side-combined
    groupBy, materialized once with an eager localCheckpoint); the
    bounds, the group dim, and the spine are all derived from that
    tiny groups-x-buckets aggregate, never by re-scanning the input.
    AQE picks broadcast for the spine join when groups x buckets is
    small; both join sides are bounded by groups x buckets, never by
    event volume.
    """
    b = F.date_trunc(bucket, F.col(ts_col))
    agg = (
        events.groupBy(F.col(group_col).alias("g"), b.alias("b"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
        )
        .localCheckpoint(eager=True)  # one scan of events feeds everything below
    )
    lo, hi = agg.select(F.min("b"), F.max("b")).first()
    if lo is None:  # empty input -> empty (correctly-typed) gapfill
        return agg.select(
            F.col("b").alias("bucket_start"),
            F.col("g").alias(group_col),
            "n_events",
            "sum_value",
        )
    step = F.expr(f"interval 1 {bucket}")
    spine = (
        agg.select("g").distinct()
        .crossJoin(
            events.sparkSession.range(1).select(
                F.explode(F.sequence(F.lit(lo), F.lit(hi), step)).alias("b")
            )
        )
    )
    return (
        spine.join(agg, ["g", "b"], "left")
        .select(
            F.col("b").alias("bucket_start"),
            F.col("g").alias(group_col),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.col("sum_value"),
        )
    )
