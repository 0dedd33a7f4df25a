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
NOTE "arrival order" is Spark's FileStreamSource order — file
MODIFICATION TIME, not file name; producers that need a deterministic
keep-rule must stamp monotone mtimes (the tests do, via os.utime).
WITHIN one micro-batch, ``dropDuplicates`` keeps an arbitrary row per
hash (partition iteration order — a pre-shuffle sort cannot survive
the dedup operator's own exchange), so the min-doc_id keep-rule
additionally requires that two copies of the same hash never co-occur
in a single batch: one file per trigger and no intra-file duplicates.
Producers that can't guarantee that should pre-clean each file with
the batch ``exact_duplicates`` reducer before landing it.
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
    AvailableNow (one file per micro-batch → arrival order = file
    MODIFICATION-TIME order, FileStreamSource's ordering), writing
    survivors to ``output_dir``."""
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


def _committed_batches(spark: SparkSession, markers_dir: str) -> list[int]:
    from incubator_hugegraph_computer_spark.fsutil import hadoop_fs

    fs, p = hadoop_fs(spark, markers_dir)
    if not fs.exists(p):
        return []
    out = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if name.startswith("batch-"):
            out.append(int(name.split("-", 1)[1]))
    return sorted(out)


def _mark_committed(spark: SparkSession, markers_dir: str, batch_id: int) -> None:
    from incubator_hugegraph_computer_spark.fsutil import touch

    touch(spark, f"{markers_dir}/batch-{batch_id}")


def read_survivors(spark: SparkSession, survivors_dir: str) -> DataFrame:
    """The near-dup stream's survivor corpus: the union of committed
    per-batch subdirectories (see :func:`run_neardup_stream`'s
    exactly-once note — uncommitted partial attempts are excluded)."""
    done = _committed_batches(spark, survivors_dir + "_committed")
    if not done:
        # distinct from "partial batch-0 exists": an uncommitted attempt
        # must not be readable as if it were corpus
        raise FileNotFoundError(f"no committed batches under {survivors_dir}")
    return spark.read.parquet(*[f"{survivors_dir}/batch-{b}" for b in done])


def run_neardup_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    survivors_dir: str,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    max_files_per_trigger: int = 1,
) -> None:
    """Streaming NEAR-dup ingestion: each micro-batch is deduplicated
    against the accumulated survivor corpus with
    :func:`...dedup.incremental_minhash_dedup` (LSH band-bucket index
    join + exact-Jaccard verify), then pruned within the batch, and the
    novel remainder is appended to the survivor corpus — which IS the
    index the next batch joins against. ``foreachBatch`` runs batches
    sequentially, so the read-then-append on ``survivors_dir`` is safe.

    Keep rule (deterministic, tested against a sequential oracle): a doc
    survives iff it has no match ≥ ``threshold`` with any EARLIER
    survivor, and no match with any lower-id doc of its own batch
    (conservative within-batch pruning — a batch is one crawl shard).

    The corpus is NEVER re-hashed: alongside the survivor docs the
    stream maintains two side tables — ``<survivors_dir>_index``
    (persisted :func:`lsh_band_buckets`) and ``<survivors_dir>_shingles``
    — adding each batch's novel rows. Every batch joins those
    precomputed tables (bucket-bounded candidates, shingle join only on
    candidates), so per-batch compute is O(batch + candidates), not
    O(corpus).

    Exactly-once under foreachBatch's at-least-once replays: each batch
    writes its three outputs to per-batch subdirectories
    (``.../batch-<id>``, mode=overwrite, so a retry of a half-written
    attempt replaces it byte-for-byte) and then creates a marker file in
    ``<survivors_dir>_committed`` as the LAST step. Readers — both this
    stream's own corpus-index reads and :func:`read_survivors` — are
    driven by the marker list, so a crashed attempt's partial subdirs
    are invisible until its retry commits, a replay of an
    already-committed batch is a no-op, and works on any Hadoop
    filesystem (hdfs://, s3a://), not just local paths.
    """
    from incubator_hugegraph_computer_spark.functions.dedup import (
        incremental_minhash_dedup,
        lsh_band_buckets,
        minhash_candidates,
        shingles,
    )

    schema = spark.read.parquet(source_dir).schema
    index_dir = survivors_dir + "_index"
    shingles_dir = survivors_dir + "_shingles"
    markers_dir = survivors_dir + "_committed"

    def process(batch: DataFrame, batch_id: int) -> None:
        done = _committed_batches(spark, markers_dir)
        if batch_id in done:
            return  # replay of a fully-committed batch: no-op
        batch = batch.persist()
        # tokenize+shingle ONCE per batch — the dominant per-batch cost;
        # every downstream stage (delta-vs-corpus verify, within-batch
        # candidates, index maintenance) joins this one table
        sh_batch = shingles(batch, n).persist()
        novel = batch
        sh_novel = sh_batch
        if done:
            verdict = incremental_minhash_dedup(
                batch,
                None,
                num_hashes,
                bands,
                n,
                threshold,
                corpus_index=spark.read.parquet(
                    *[f"{index_dir}/batch-{b}" for b in done]
                ),
                corpus_shingles=spark.read.parquet(
                    *[f"{shingles_dir}/batch-{b}" for b in done]
                ),
                new_shingles=sh_batch,
            )
            keep = verdict.where(F.col("keep") == 1).select("doc_id")
            novel = batch.join(keep, "doc_id", "left_semi")
            sh_novel = sh_batch.join(keep, "doc_id", "left_semi")
        # within-batch: drop any doc matching a lower-id doc in the batch
        losers = minhash_candidates(
            novel, num_hashes, bands, n, threshold, shingle_table=sh_novel
        ).select(F.col("doc_b").alias("doc_id")).distinct()
        survivors = novel.join(losers, "doc_id", "left_anti").persist()
        sh_surv = sh_novel.join(losers, "doc_id", "left_anti")
        survivors.write.mode("overwrite").parquet(f"{survivors_dir}/batch-{batch_id}")
        # maintain the index side tables for the next batch
        lsh_band_buckets(
            survivors, num_hashes, bands, n, shingle_table=sh_surv
        ).write.mode("overwrite").parquet(f"{index_dir}/batch-{batch_id}")
        sh_surv.withColumnRenamed("doc_id", "corpus_id").write.mode(
            "overwrite"
        ).parquet(f"{shingles_dir}/batch-{batch_id}")
        survivors.unpersist()
        sh_batch.unpersist()
        batch.unpersist()
        # marker LAST: commits the batch for every reader
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
