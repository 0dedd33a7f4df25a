"""Structured Streaming over the events table.

The reference is batch-only (SURVEY §2.9) — streaming here is the
Spark-native extension for incremental graph/corpus ingest: the same
windowed aggregation is exposed twice, as a batch query (oracle-
checkable) and as a readStream→writeStream pipeline with a watermark
for late data (tested with Trigger.AvailableNow against the same
parquet input; on a cluster the source would be Kafka/files and the
sink an Iceberg table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def windowed_event_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window counts + value sums per event_type (batch form)."""
    return (
        events.groupBy(
            F.window(F.col("ts"), window).alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_windowed_event_counts(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> None:
    """Streaming form: file source → watermarked tumbling window →
    parquet sink, processed with AvailableNow (drains all available
    input then stops — the batch-testable streaming trigger)."""
    schema = spark.read.parquet(input_dir).schema
    stream = spark.readStream.schema(schema).parquet(input_dir)
    # watermarks need zoned timestamps (session TZ is UTC in session.py)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window(F.col("ts"), window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
