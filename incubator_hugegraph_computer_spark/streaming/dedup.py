"""Streaming exact deduplication — incremental corpus ingest.

The batch dedup family (functions/dedup.py) assumes the whole corpus is
on disk. Real training-data pipelines ingest continuously; the Spark-
native shape for "keep only the first copy of each document ever seen"
is a streaming ``dropDuplicates`` on the content fingerprint: state =
one entry per distinct hash in the state store (RocksDB-backed on a
real cluster — O(distinct docs) keys of 16 bytes each, partitioned by
hash, no skew), each micro-batch emits only rows whose fingerprint is
new.

Two variants:

- :func:`dedup_stream` — unbounded state, exact forever (the batch
  ``exact_duplicates`` semantics applied to an infinite corpus).
- :func:`dedup_stream_windowed` — ``dropDuplicatesWithinWatermark``:
  state expires once the watermark passes, bounding the store for
  pipelines where duplicates arrive close together (crawl re-fetches),
  at the cost of missing re-occurrences older than the watermark.

Parity contract (tested): feeding the corpus through the stream in
deterministic order emits exactly the batch winners — one row per
distinct md5, the first-arrived (= min doc_id when fed in id order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def fingerprinted(docs: DataFrame) -> DataFrame:
    """Attach the exact-dedup key (md5 of raw text — the same key
    functions/dedup.py:exact_duplicates groups on)."""
    return docs.withColumn("h", F.md5("text"))


def dedup_stream(docs_stream: DataFrame) -> DataFrame:
    """First-seen-wins exact dedup over a streaming documents source.

    State: one state-store entry per distinct hash, forever."""
    return fingerprinted(docs_stream).dropDuplicates(["h"])


def dedup_stream_windowed(
    docs_stream: DataFrame, ts_col: str = "ts", watermark: str = "1 hour"
) -> DataFrame:
    """Exact dedup with bounded state: duplicates are only suppressed
    while their first copy is younger than ``watermark``."""
    return (
        fingerprinted(docs_stream)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["h"])
    )


def run_dedup_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    max_files_per_trigger: int = 1,
) -> None:
    """Drive :func:`dedup_stream` over a parquet directory with
    AvailableNow (one file per micro-batch → deterministic arrival
    order = file name order), writing survivors to ``output_dir``."""
    schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    (
        dedup_stream(stream)
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
