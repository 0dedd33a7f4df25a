"""Gap-based sessionization — the custom stateful streaming operator.

The reference engine is batch-only (SURVEY §2.9); this is the
Spark-native extension point for incremental ingest pipelines. The same
semantics are exposed twice:

- ``sessionize_batch`` — window-function form (lag + running sum of
  gap-break flags), fully relational and oracle-checkable in any SQL
  engine: a new session starts when the gap to the previous event of
  the same user exceeds ``gap``.
- ``sessionize_stream`` — ``applyInPandasWithState`` form over
  ``readStream``: per-user state holds the open session; an arriving
  batch closes every session whose successor event is more than ``gap``
  later and emits it, keeping only the still-open tail session in
  state (flushed on event-time timeout). Tested with
  Trigger.AvailableNow equal to the batch form restricted to sessions
  the final watermark has closed.

Session row: (user_id, session_start, session_end, n_events, sum_value).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)
_STATE_SCHEMA = "start long, end long, n long, s double"
_US = 1_000_000  # timestamps carried as epoch microseconds in state


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Relational sessionization: break when gap > ``gap_minutes``."""
    # parquet timestamps may arrive as TIMESTAMP_NTZ; session TZ is UTC
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_s = gap_minutes * 60
    flagged = events.withColumn(
        "new_sess",
        (
            F.coalesce(
                F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w),
                F.lit(float(gap_s + 1)),
            )
            > gap_s
        ).cast("long"),
    ).withColumn("sess_no", F.sum("new_sess").over(w))
    return flagged.groupBy("user_id", "sess_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    ).drop("sess_no")


def _sessionize_group(
    key: Tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
    gap_us: int,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        start, end, n, s = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start, unit="us")],
                "session_end": [pd.Timestamp(end, unit="us")],
                "n_events": [n],
                "sum_value": [round(s, 6)],
            }
        )
        return

    ts_list: list[int] = []
    val_list: list[float] = []
    for pdf in batches:
        ts_list.extend(pdf["ts"].astype("int64") // 1000)  # ns → us
        val_list.extend(pdf["value"].astype(float))
    order = sorted(range(len(ts_list)), key=ts_list.__getitem__)
    ts_sorted = [ts_list[i] for i in order]
    vals = [val_list[i] for i in order]

    # sessions from this batch's events alone (event-time order)
    sessions: list[list] = []
    for t, v in zip(ts_sorted, vals):
        if sessions and t - sessions[-1][1] <= gap_us:
            cur = sessions[-1]
            cur[1] = max(cur[1], t)
            cur[2] += 1
            cur[3] += v
        else:
            sessions.append([t, t, 1, v])
    if state.exists:
        # merge the stored open session in EVENT-TIME order: a late
        # event (above watermark) may fall before, inside, or after it.
        # Interval-merging with the gap rule handles all three — in
        # particular an event within gap BEFORE the stored start extends
        # session_start backwards (min), and one more than gap before
        # it becomes its own earlier session, exactly like the batch
        # window form.
        sessions.append(list(state.get))
        sessions.sort(key=lambda r: (r[0], r[1]))
        merged: list[list] = []
        for r in sessions:
            if merged and r[0] - merged[-1][1] <= gap_us:
                m = merged[-1]
                m[1] = max(m[1], r[1])
                m[2] += r[2]
                m[3] += r[3]
            else:
                merged.append(r)
        sessions = merged
    *closed, open_sess = sessions
    out_rows: list[tuple[int, int, int, float]] = [tuple(r) for r in closed]
    start, end, n, s = open_sess
    state.update((start, end, n, s))
    # flush the open session once the event-time watermark passes its
    # close boundary (session_end + gap)
    state.setTimeoutTimestamp((end + gap_us) // 1000)

    if out_rows:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out_rows),
                "session_start": [pd.Timestamp(r[0], unit="us") for r in out_rows],
                "session_end": [pd.Timestamp(r[1], unit="us") for r in out_rows],
                "n_events": [r[2] for r in out_rows],
                "sum_value": [round(r[3], 6) for r in out_rows],
            }
        )


def sessionize_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    gap_minutes: int = 30,
    watermark: str = "0 seconds",
) -> None:
    """Streaming sessionization: file source → per-user
    ``applyInPandasWithState`` (event-time timeout) → parquet sink,
    drained with AvailableNow. State per user is one open session —
    O(|users|), not O(|events|)."""
    gap_us = gap_minutes * 60 * _US
    schema = spark.read.parquet(input_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(input_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
    )
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        lambda key, pdfs, state: _sessionize_group(key, pdfs, state, gap_us),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    q = (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
