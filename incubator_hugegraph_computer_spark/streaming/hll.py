"""Streaming HyperLogLog maintenance — grouped distinct-count
registers MAX-merged per micro-batch.

The portable-md5 HLL registers (``functions/sketches.hll_distinct``)
are idempotent-mergeable by per-register MAX, so the stream never
rescans history: each micro-batch contributes its own
(group, j, mv) register rows, merged into the running state by MAX —
O(|batch| + groups·m) per batch. Same exactly-once recipe as the CMS
stream (``streaming/heavy_hitters.py``): foreachBatch + per-batch
output + marker file LAST.

Parity contract (tested): after draining, the maintained registers
equal a single batch pass over the union of all batches, register for
register — and therefore the estimates match exactly too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from incubator_hugegraph_computer_spark.streaming.dedup import (
    _committed_batches,
    _mark_committed,
)


def _registers(
    df: DataFrame, key_col: str, group_col: str, m: int, seed: str
) -> DataFrame:
    """Sparse (group, j, mv) register rows for one batch — the same
    derivation as ``sketches.hll_distinct``'s per stage."""
    hexcol = F.md5(F.concat_ws(":", F.col(key_col).cast("string"), F.lit(seed)))
    x = F.conv(F.substring(hexcol, 3, 8), 16, 10).cast("long")
    return (
        df.select(
            F.col(group_col).alias("grp"),
            (F.conv(F.substring(hexcol, 1, 2), 16, 10).cast("long") % m).alias("j"),
            F.when(x == 0, F.lit(33))
            .otherwise(F.lit(33) - F.length(F.bin(x)))
            .cast("long")
            .alias("mv"),
        )
        .groupBy("grp", "j")
        .agg(F.max("mv").alias("mv"))
    )


def read_hll(spark: SparkSession, out_dir: str) -> DataFrame:
    """Latest committed (grp, j, mv, m) register state — ``m`` rides in
    the state so estimates can never be computed against the wrong
    register count."""
    done = _committed_batches(spark, out_dir + "_committed")
    if not done:
        raise FileNotFoundError(f"no committed hll batches under {out_dir}")
    return spark.read.parquet(f"{out_dir}/batch-{max(done)}")


def hll_estimates(registers: DataFrame, m: int | None = None) -> DataFrame:
    """(grp, est_distinct) from sparse register rows (absent registers
    count as 0 — the dense fill happens here, not in state).

    ``m`` defaults to the register count persisted in the state's ``m``
    column (written by ``run_hll_stream``); passing a mismatched
    explicit value raises instead of silently using the wrong alpha and
    absent-register fill."""
    persisted = None
    if "m" in registers.columns:
        vals = [r[0] for r in registers.select("m").distinct().limit(2).collect()]
        if len(vals) > 1:
            raise ValueError(f"mixed register counts in state: {sorted(vals)}")
        persisted = int(vals[0]) if vals else None
        registers = registers.drop("m")
    if m is None:
        if persisted is None:
            raise ValueError(
                "register count unknown: state has no 'm' column and no "
                "explicit m was given"
            )
        m = persisted
    elif persisted is not None and m != persisted:
        raise ValueError(
            f"explicit m={m} contradicts the persisted register count "
            f"{persisted}"
        )
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    n_absent = m - F.count(F.lit(1))
    return (
        registers.groupBy("grp")
        .agg(
            (
                F.sum(F.pow(F.lit(2.0), -F.col("mv")))
                + n_absent.cast("double")  # 2^-0 per missing register
            ).alias("z")
        )
        .select(
            "grp",
            F.round(F.lit(alpha) * F.lit(float(m * m)) / F.col("z"), 6).alias(
                "est_distinct"
            ),
        )
    )


def run_hll_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    key_col: str = "user_id",
    group_col: str = "event_type",
    registers: int = 16,
    seed: str = "hll",
    max_files_per_trigger: int = 1,
) -> None:
    """Maintain per-group HLL registers over a parquet event stream
    with AvailableNow triggers."""
    schema = spark.read.parquet(source_dir).schema
    markers_dir = out_dir + "_committed"

    def process(batch: DataFrame, batch_id: int) -> None:
        done = _committed_batches(spark, markers_dir)
        if batch_id in done:
            return
        delta = _registers(batch, key_col, group_col, registers, seed)
        if done:
            prev = spark.read.parquet(f"{out_dir}/batch-{max(done)}").drop("m")
            merged = (
                prev.unionByName(delta)
                .groupBy("grp", "j")
                .agg(F.max("mv").alias("mv"))
            )
        else:
            merged = delta
        # persist the register count with the state so read_hll +
        # hll_estimates can never disagree with the stream's m
        merged = merged.withColumn("m", F.lit(registers))
        merged.write.mode("overwrite").parquet(f"{out_dir}/batch-{batch_id}")
        _mark_committed(spark, markers_dir, batch_id)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
