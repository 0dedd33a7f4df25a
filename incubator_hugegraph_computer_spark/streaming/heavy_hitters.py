"""Streaming count-min maintenance — the additive sketch merged per
micro-batch.

The CMS is a fixed-size counter matrix and addition-mergeable, so the
stream never rescans history: each micro-batch contributes its own
(r, col, cnt) delta, merged into the running sketch by summing cells —
O(|batch| + depth·width) per batch. Same exactly-once recipe as the
other incremental stores (``streaming/quotient.py``): foreachBatch +
per-batch output directory + marker file LAST, so at-least-once
replays of a committed batch are no-ops.

Parity contract (tested): after draining, the maintained sketch equals
``functions/sketches.cms_build`` over the union of all batches,
cell for cell — not just estimate for estimate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from incubator_hugegraph_computer_spark.functions.sketches import cms_build
from incubator_hugegraph_computer_spark.streaming.dedup import (
    _committed_batches,
    _mark_committed,
)


def read_cms(spark: SparkSession, out_dir: str) -> DataFrame:
    """Latest committed (r, col, cnt) sketch state."""
    done = _committed_batches(spark, out_dir + "_committed")
    if not done:
        raise FileNotFoundError(f"no committed cms batches under {out_dir}")
    return spark.read.parquet(f"{out_dir}/batch-{max(done)}")


def run_cms_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    key_col: str = "event_type",
    depth: int = 4,
    width: int = 1024,
    max_files_per_trigger: int = 1,
) -> None:
    """Maintain a count-min sketch of ``key_col`` frequencies over a
    parquet event stream with AvailableNow triggers."""
    schema = spark.read.parquet(source_dir).schema
    markers_dir = out_dir + "_committed"

    def process(batch: DataFrame, batch_id: int) -> None:
        done = _committed_batches(spark, markers_dir)
        if batch_id in done:
            return
        delta = cms_build(batch, key_col, depth=depth, width=width)
        if done:
            prev = spark.read.parquet(f"{out_dir}/batch-{max(done)}")
            merged = (
                prev.unionByName(delta)
                .groupBy("r", "col")
                .agg(F.sum("cnt").alias("cnt"))
            )
        else:
            merged = delta
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
