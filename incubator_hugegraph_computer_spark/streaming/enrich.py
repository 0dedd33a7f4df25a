"""Stream as-of enrichment — the streaming twin of
``functions.temporal.asof_join`` (backward direction).

Each arriving "left" event (e.g. a purchase) is enriched with the most
recent prior "right" event (e.g. a click) of the same key. State per
key is ONE row — the best (max-ts, then max-value) right event seen so
far — so state size is O(|keys|), independent of stream length.

Semantics vs the batch operator: within a micro-batch rows are
processed in (ts, event_id) order, so a right row enriches left rows
later in the same batch exactly like the batch union-tag merge; across
batches a right row that arrives out-of-order behind the stored one is
ignored (watermark-style graceful degradation). With
``Trigger.AvailableNow`` over a static input — one batch — the output
equals batch ``asof_join`` exactly, which is what the stream==batch
test pins.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ENRICH_SCHEMA = (
    "event_id long, user_id long, ts timestamp, value double, "
    "matched_value double, matched_ts timestamp"
)
_STATE_SCHEMA = "best_ts long, best_value double"
_US = 1_000_000


def _enrich_group(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    left_type: str,
    right_type: str,
    tolerance_s: float | None,
) -> Iterator[pd.DataFrame]:
    user_id = key[0]
    pdf = pd.concat(list(pdfs), ignore_index=True)
    pdf = pdf[pdf["event_type"].isin([left_type, right_type])]
    if pdf.empty and not state.exists:
        return
    # at equal ts the right row must process BEFORE the left row so the
    # same-instant match is inclusive — the batch operator's
    # (_ats, _side) sort order (temporal.py)
    pdf = pdf.assign(_is_left=(pdf["event_type"] == left_type).astype(int))
    pdf = pdf.sort_values(["ts", "_is_left", "event_id"], kind="mergesort")
    best_ts, best_val = state.get if state.exists else (None, None)
    out: list[tuple] = []
    for ts, eid, etype, val in zip(
        pdf["ts"], pdf["event_id"], pdf["event_type"], pdf["value"]
    ):
        ts_us = int(pd.Timestamp(ts).value // 1_000)  # ns -> us
        if etype == right_type:
            # keep the max-ts right row; on a ts tie keep the max value
            # (the batch operator's max-struct tie collapse)
            if best_ts is None or ts_us > best_ts or (ts_us == best_ts and val > best_val):
                best_ts, best_val = ts_us, float(val)
        else:
            m_ts, m_val = best_ts, best_val
            # a late-arriving LEFT row must never match a right row from
            # its future (backward as-of is causal), and tolerance gates
            # the causal distance
            if m_ts is not None and (
                m_ts > ts_us
                or (tolerance_s is not None and ts_us - m_ts > tolerance_s * _US)
            ):
                m_ts, m_val = None, None
            out.append((int(eid), user_id, ts, float(val), m_val, m_ts))
    if best_ts is not None:
        state.update((best_ts, best_val))
    if out:
        yield pd.DataFrame(
            {
                "event_id": [r[0] for r in out],
                "user_id": [r[1] for r in out],
                "ts": [r[2] for r in out],
                "value": [r[3] for r in out],
                "matched_value": [r[4] for r in out],
                "matched_ts": [
                    pd.Timestamp(r[5], unit="us") if r[5] is not None else pd.NaT
                    for r in out
                ],
            }
        )


def stream_asof_enrich(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    left_type: str = "purchase",
    right_type: str = "click",
    tolerance_s: float | None = None,
) -> None:
    """File source → per-key ``applyInPandasWithState`` as-of
    enrichment → parquet sink, drained with AvailableNow. Keys are
    users (bounded), state one row per key; a production deployment
    bounding key cardinality would add an event-time timeout exactly
    like ``sessions.sessionize_stream``."""
    schema = spark.read.parquet(input_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(input_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    enriched = stream.groupBy("user_id").applyInPandasWithState(
        lambda key, pdfs, state: _enrich_group(
            key, pdfs, state, left_type, right_type, tolerance_s
        ),
        outputStructType=ENRICH_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        enriched.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
