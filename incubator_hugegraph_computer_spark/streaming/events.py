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


def funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("signup", "view", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(user_id, step, t_step1, t_step2, ...) — ordered-funnel analysis:
    ``step`` = how deep the user got, where step k counts only if its
    FIRST qualifying event happens strictly after the user's step-(k-1)
    time (earliest-completion semantics). The standard product-analytics
    sequence query, kept strictly relational so it runs identically on
    a 100 TB event log.

    Scale shape: one filtered min-agg per funnel stage (map-side
    combined, keyed by user) chained by hash joins on the user key —
    every join reuses the same partitioning; no window over event rows,
    no per-user sort.
    """
    out = events.select(F.col(user_col).alias("user_id")).distinct()
    prev = None  # DataFrame (user_id, t_k) of the previous stage
    tcols = []
    for k, step in enumerate(steps, start=1):
        stage = events.select(
            F.col(user_col).alias("user_id"),
            F.col(ts_col).alias("__ts"),
            F.col(type_col).alias("__et"),
        ).where(F.col("__et") == step)
        if prev is not None:
            stage = stage.join(prev, "user_id").where(F.col("__ts") > F.col(f"t{k-1}"))
        cur = stage.groupBy("user_id").agg(F.min("__ts").alias(f"t{k}"))
        out = out.join(cur, "user_id", "left")
        prev = cur
        tcols.append(f"t{k}")
    step_expr = sum(
        (F.col(c).isNotNull()).cast("int") for c in tcols
    )  # t_k non-null ⇒ all earlier non-null by construction
    return out.select(
        "user_id", step_expr.alias("step"), *[F.col(c).alias(f"t_{s}") for c, s in zip(tcols, steps)]
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_day, day_offset, n_users, retention) — classic cohort
    retention: users are grouped by their FIRST-activity day; for each
    later day offset, the fraction of the cohort active that day.

    Scale shape: first-activity is one min-agg keyed by user; the
    activity join is keyed by the same user column (co-partitioned);
    the final rollup is a tiny (days × offsets) aggregate. No window,
    no per-user sort.
    """
    acts = events.select(
        F.col(user_col).alias("user_id"), F.to_date(F.col(ts_col)).alias("day")
    ).distinct()
    first = acts.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    joined = acts.join(first, "user_id").select(
        "user_id",
        "cohort_day",
        F.datediff(F.col("day"), F.col("cohort_day")).cast("long").alias("day_offset"),
    )
    per_cell = joined.groupBy("cohort_day", "day_offset").agg(
        F.count_distinct("user_id").alias("n_users")
    )
    size = per_cell.where(F.col("day_offset") == 0).select(
        "cohort_day", F.col("n_users").alias("__size")
    )
    return (
        per_cell.join(size, "cohort_day")
        .select(
            "cohort_day",
            "day_offset",
            "n_users",
            F.round(F.col("n_users") / F.col("__size"), 6).alias("retention"),
        )
    )


def hourly_anomaly(events: DataFrame, z_threshold: float = 2.0) -> DataFrame:
    """Per-(event_type, hour) anomaly score: z = (n − mean_type) /
    stddev_pop_type over that type's populated hours — the standard
    ops-monitoring sweep (traffic spikes / drops per event class).

    Output: (event_type, hour, n_events, z, is_anomaly), z rounded 6dp;
    z = 0.0 where the type's count is constant (stddev 0). Hours with
    no events for a type are absent by construction (mean/std are over
    populated hours), which keeps the statistic join-free to compute.

    Physical shape: one groupBy(event_type, hour) with map-side
    combine, then a per-type scalar aggregate (tiny — #types rows)
    broadcast back onto the hourly table. No window functions, no
    single-partition stage; both shuffles key on event_type(+hour) —
    scale-safe for arbitrarily long event histories.
    """
    hourly = events.groupBy(
        F.col("event_type"), F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    per_type = hourly.groupBy("event_type").agg(
        F.avg("n_events").alias("_mu"),
        F.stddev_pop("n_events").alias("_sd"),
    )
    z = F.when(F.col("_sd") > 0, (F.col("n_events") - F.col("_mu")) / F.col("_sd")).otherwise(0.0)
    return (
        hourly.join(F.broadcast(per_type), "event_type")
        .select(
            "event_type",
            "hour",
            "n_events",
            F.round(z, 6).alias("z"),
            (F.abs(z) >= F.lit(z_threshold)).alias("is_anomaly"),
        )
    )
