"""Streaming host-quotient maintenance — incremental group-pair counts.

The batch operator (``operators/quotient.py``) collapses the page
graph onto host groups in one shuffle; at crawl time the edge set
grows in shards, and the host-graph should be MAINTAINED, not
recomputed: per micro-batch the delta's (gsrc, gdst) counts merge into
the running totals by addition — O(|batch| + |host pairs|) per batch,
never a rescan of the accumulated edges.

Same consistency recipe as ``streaming/graph_ingest.py``: foreachBatch
+ per-batch overwrite subdirectory + marker file LAST, so an
at-least-once replay of a committed batch is a no-op and readers only
see committed states.

Scope: maintains ``n_edges`` (additively mergeable). The batch
operator's ``n_src_vertices`` (a cross-batch DISTINCT) is not
maintainable from per-batch counts alone — a deployment wanting it
keeps a (grp-pair, src) dedup index, the same trade the incremental
dedup path documents.

Parity contract (tested): after draining, the maintained table equals
``quotient_graph`` on the union of all batches, projected to n_edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from incubator_hugegraph_computer_spark.streaming.dedup import (
    _committed_batches,
    _mark_committed,
)


def read_quotient(spark: SparkSession, out_dir: str) -> DataFrame:
    """Latest committed (gsrc, gdst, n_edges) host-graph totals."""
    done = _committed_batches(spark, out_dir + "_committed")
    if not done:
        raise FileNotFoundError(f"no committed quotient batches under {out_dir}")
    return spark.read.parquet(f"{out_dir}/batch-{max(done)}")


def run_quotient_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    mod: int = 64,
    max_files_per_trigger: int = 1,
) -> None:
    """Drive incremental host-quotient totals over a parquet edge
    stream (src, dst) with AvailableNow; grouping rule grp = id % mod
    applied to both endpoints."""
    schema = spark.read.parquet(source_dir).schema
    markers_dir = out_dir + "_committed"

    def process(batch: DataFrame, batch_id: int) -> None:
        done = _committed_batches(spark, markers_dir)
        if batch_id in done:
            return  # replay of a fully-committed batch: no-op
        delta = (
            batch.select(
                (F.col("src") % mod).alias("gsrc"), (F.col("dst") % mod).alias("gdst")
            )
            .groupBy("gsrc", "gdst")
            .agg(F.count(F.lit(1)).alias("n_edges"))
        )
        if done:
            prev = spark.read.parquet(f"{out_dir}/batch-{max(done)}")
            merged = (
                prev.unionByName(delta)
                .groupBy("gsrc", "gdst")
                .agg(F.sum("n_edges").alias("n_edges"))
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
