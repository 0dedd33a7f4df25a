"""Gap-based sessionization — the custom stateful streaming operator.

The reference engine is batch-only (SURVEY §2.9); this is the
Spark-native extension point for incremental ingest pipelines. The same
semantics are exposed twice:

- ``sessionize_batch`` — window-function form (lag + running sum of
  gap-break flags), fully relational and oracle-checkable in any SQL
  engine: a new session starts when the gap to the previous event of
  the same user exceeds ``gap``.
- ``sessionize_stream`` — ``applyInPandasWithState`` form over
  ``readStream``: per-user state holds every session the event-time
  watermark has not yet closed (a session is mutable until the
  watermark passes ``session_end + gap`` — an on-time late event may
  still merge into a successor-closed session, so eager emission would
  split it); sessions are emitted exactly when the watermark passes
  their close boundary (event-time timeout flushes between batches).
  Tested with Trigger.AvailableNow equal to the batch form restricted
  to sessions the final watermark has closed.

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
_STATE_SCHEMA = (
    "starts array<long>, ends array<long>, ns array<long>, ss array<double>"
)
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
    """A session is emitted ONLY once the event-time watermark passes
    its close boundary (session_end + gap): until then any on-time
    event — including one older than a session already closed by a
    successor — may still merge into or extend it, so eager emission
    would split what the batch form reports as one session. State
    therefore holds EVERY unflushed session (bounded by the watermark
    horizon / gap, not by stream length); the timeout flushes the rest
    when the watermark advances past their close boundaries."""
    (user_id,) = key
    sessions: list[list] = []
    if state.exists:
        starts, ends, ns, ss = state.get
        sessions = [list(t) for t in zip(starts, ends, ns, ss)]

    ts_list: list[int] = []
    val_list: list[float] = []
    if not state.hasTimedOut:
        for pdf in batches:
            ts_list.extend(pdf["ts"].astype("int64") // 1000)  # ns → us
            val_list.extend(pdf["value"].astype(float))
    for i in sorted(range(len(ts_list)), key=ts_list.__getitem__):
        sessions.append([ts_list[i], ts_list[i], 1, val_list[i]])

    # interval-merge everything in EVENT-TIME order with the gap rule: a
    # late (above-watermark) event may fall before, inside, or after any
    # stored session — merging the full set handles every case exactly
    # like the batch window form.
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

    wm_us = state.getCurrentWatermarkMs() * 1000
    flush = [s for s in merged if s[1] + gap_us <= wm_us]
    keep = [s for s in merged if s[1] + gap_us > wm_us]
    if keep:
        state.update((
            [s[0] for s in keep],
            [s[1] for s in keep],
            [s[2] for s in keep],
            [s[3] for s in keep],
        ))
        next_close_ms = min(s[1] + gap_us for s in keep) // 1000
        state.setTimeoutTimestamp(max(next_close_ms, wm_us // 1000 + 1))
    elif state.exists:
        state.remove()

    if flush:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(flush),
                "session_start": [pd.Timestamp(r[0], unit="us") for r in flush],
                "session_end": [pd.Timestamp(r[1], unit="us") for r in flush],
                "n_events": [r[2] for r in flush],
                "sum_value": [round(r[3], 6) for r in flush],
            }
        )


def sessionize_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    gap_minutes: int = 30,
    watermark: str = "0 seconds",
    max_files_per_trigger: int | None = None,
) -> None:
    """Streaming sessionization: file source → per-user
    ``applyInPandasWithState`` (event-time timeout) → parquet sink,
    drained with AvailableNow. State per user is one open session —
    O(|users|), not O(|events|)."""
    gap_us = gap_minutes * 60 * _US
    schema = spark.read.parquet(input_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = (
        reader.parquet(input_dir)
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
