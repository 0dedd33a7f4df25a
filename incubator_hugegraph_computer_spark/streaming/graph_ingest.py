"""Streaming graph ingest — incremental WCC maintenance per edge batch.

The reference is batch-only (SURVEY §2.9); this is the Spark-native
extension the north star's "incremental graph ingest" implies: edge
batches (a crawl shard's new import/dependency edges) arrive on a
stream, and the weakly-connected-component labeling is MAINTAINED via
``operators.wcc.wcc_incremental`` — per batch a contraction graph of
O(|batch|) edges, never a rescan of the accumulated edge set.

Physical/consistency shape (same recipe as ``streaming/dedup.py``'s
near-dup stream): ``foreachBatch`` runs micro-batches sequentially;
each batch writes the updated FULL label table to a per-batch
subdirectory (mode=overwrite, so an at-least-once replay of a
half-written attempt replaces it byte-for-byte) and creates a marker
file LAST, so readers only ever see committed label sets and a replay
of a committed batch is a no-op. Compute per batch is O(|delta|); the
label PERSISTENCE is one V-row write — the production refinement
(journal only the tiny comp→comp mapping + fresh vertices, compact
every K batches) trades that write for read-side join depth and drops
in behind the same markers.

Parity contract (tested): after draining the stream, the maintained
labels equal ``wcc`` recomputed on the union of all edge batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from incubator_hugegraph_computer_spark.streaming.dedup import (
    _committed_batches,
    _mark_committed,
)


def read_components(spark: SparkSession, labels_dir: str) -> DataFrame:
    """The latest committed (id, comp) labeling — labels are cumulative,
    so the highest committed batch holds the full table."""
    done = _committed_batches(spark, labels_dir + "_committed")
    if not done:
        raise FileNotFoundError(f"no committed label batches under {labels_dir}")
    return spark.read.parquet(f"{labels_dir}/batch-{max(done)}")


def run_wcc_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    labels_dir: str,
    max_files_per_trigger: int = 1,
    **wcc_kwargs,
) -> None:
    """Drive incremental WCC over a parquet edge stream (src, dst) with
    AvailableNow; one file per micro-batch → arrival order = file
    modification-time order (FileStreamSource ordering — producers
    stamp monotone mtimes, as the dedup stream documents)."""
    from incubator_hugegraph_computer_spark.graph import Graph
    from incubator_hugegraph_computer_spark.operators.wcc import wcc, wcc_incremental

    schema = spark.read.parquet(source_dir).schema
    markers_dir = labels_dir + "_committed"
    wcc_kwargs.setdefault("count_messages", False)

    def process(batch: DataFrame, batch_id: int) -> None:
        done = _committed_batches(spark, markers_dir)
        if batch_id in done:
            return  # replay of a fully-committed batch: no-op
        edges = batch.select("src", "dst")
        if done:
            prev = spark.read.parquet(f"{labels_dir}/batch-{max(done)}")
            labels = wcc_incremental(prev, edges, **wcc_kwargs)
        else:
            labels = wcc(Graph.from_edges(edges), **wcc_kwargs)
        labels.write.mode("overwrite").parquet(f"{labels_dir}/batch-{batch_id}")
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
