"""Per-superstep checkpoint + resume with lineage and counters.

Mirrors the reference's snapshot semantics
(``computer-core/.../snapshot/SnapshotManager.java:54-246``: per-partition
vertex/edge/message snapshots to object storage) and its per-superstep
status/value files (``FileGraphPartition.java:286-313``): a superstep is
durable iff its state table, aggregator values and metrics row are all
committed.

Two state backends, same commit protocol:

- **directory** (default): parquet with directory partitioning —

      <root>/<run_id>/superstep=<k>/state/*.parquet (+ partition lineage col)
      <root>/<run_id>/superstep=<k>/aggs.json        (aggregators, atomic rename)
      <root>/<run_id>/metrics.jsonl                  (one row per superstep)

- **table** (``state_table=``): state rows land in a catalog table
  partitioned by ``(run_id, superstep)`` through the DataFrameWriterV2
  API (``df.writeTo(t).using(provider)`` / ``overwritePartitions()``) —
  the v2 write path is catalog-agnostic, so with an Iceberg catalog
  configured (``spark.sql.catalog.<name>`` + the Iceberg runtime jar,
  which this sandbox does not ship) the SAME code commits Iceberg
  snapshots; with the session catalog it is a managed parquet table.
  Message snapshots go to ``<state_table>_messages``. Markers and
  metrics stay sidecar files under <root> in both backends — the commit
  point must cover state + aggregators + metrics together, which no
  single table commit can.

``aggs.json`` is written last and atomically — its presence marks the
superstep complete (the commit point), so a kill mid-write never yields
a half-checkpoint that resume would trust.

ALL sidecar IO (markers, metrics, lineage listing, cleanup) goes through
the Hadoop FS of the checkpoint root's scheme (``fsutil``) — the state
parquet is written by Spark to that filesystem, so driver-local
``os``/``open`` would split the commit protocol across two filesystems
the moment the root is ``hdfs://``/``s3a://`` (empty lineage, markers on
one driver's local disk, stale-state resumes).
"""

from __future__ import annotations

import json
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

from incubator_hugegraph_computer_spark import fsutil


class CheckpointManager:
    def __init__(
        self,
        root: str,
        run_id: str,
        every: int = 1,
        spark: SparkSession | None = None,
        state_table: str | None = None,
        table_provider: str = "parquet",
    ):
        self.root = root
        self.run_id = run_id
        self.every = max(1, every)
        self.run_dir = fsutil.join(root, run_id)
        self._spark = spark
        self.state_table = state_table
        self.table_provider = table_provider

    def _sp(self) -> SparkSession:
        if self._spark is None:
            self._spark = SparkSession.getActiveSession()
            if self._spark is None:
                raise RuntimeError("CheckpointManager needs an active SparkSession")
        return self._spark

    def _fs(self, d: str):
        return fsutil.hadoop_fs(self._sp(), d)

    # ------------------------------------------------------------ paths
    def _step_dir(self, superstep: int) -> str:
        return fsutil.join(self.run_dir, f"superstep={superstep}")

    def _aggs_path(self, superstep: int) -> str:
        return fsutil.join(self._step_dir(superstep), "aggs.json")

    # ------------------------------------------------------------ write
    def should_checkpoint(self, superstep: int) -> bool:
        return superstep % self.every == 0

    def save(
        self,
        superstep: int,
        state: DataFrame,
        aggregators: dict[str, Any],
        metrics: dict[str, Any] | None = None,
        messages: DataFrame | None = None,
    ) -> DataFrame:
        """Persist state + aggs + metrics; return the re-read state (which
        truncates the iterative plan's lineage — the Spark analogue of the
        reference's write-next-superstep-files-then-swap at
        ``FileGraphPartition.java:367-409``)."""
        step_dir = self._step_dir(superstep)
        state_dir = fsutil.join(step_dir, "state")
        fs, step_p = self._fs(step_dir)
        if fs.exists(step_p):
            fs.delete(step_p, True)  # re-running a step overwrites a partial attempt
        if self.state_table is not None:
            self._write_table(state, self.state_table, superstep)
            if messages is not None:
                self._write_table(messages, f"{self.state_table}_messages", superstep)
            partition_lineage, bytes_written = self._table_lineage(superstep)
        else:
            (
                state.withColumn("partition_id", F.spark_partition_id())
                .write.mode("overwrite")
                .parquet(state_dir)
            )
            if messages is not None:
                # the combined inbox this superstep's update consumed —
                # SnapshotManager also snapshots message files per
                # partition; replaying step k = load(k-1).state + these
                (
                    messages.withColumn("partition_id", F.spark_partition_id())
                    .write.mode("overwrite")
                    .parquet(fsutil.join(step_dir, "messages"))
                )
            # Per-partition lineage from the written files (driver-side FS
            # listing, no extra Spark job): one part-file per write task, so
            # each checkpoint records which partition wrote how many state
            # rows / bytes — SnapshotManager's per-partition snapshot
            # manifest. Row counts come from the parquet footer when the
            # file is locally readable; on remote filesystems the byte sizes
            # (from FileStatus) are always exact and rows are -1.
            partition_lineage = []
            bytes_written = 0
            sfs, state_p = self._fs(state_dir)
            files = []
            it = sfs.listFiles(state_p, True)
            while it.hasNext():
                files.append(it.next())
            for st in sorted(files, key=lambda s: s.getPath().getName()):
                name = st.getPath().getName()
                size = st.getLen()
                bytes_written += size
                if name.endswith(".parquet"):
                    n_rows = -1
                    uri = st.getPath().toUri()
                    if uri.getScheme() in (None, "file"):
                        try:
                            import pyarrow.parquet as pq

                            n_rows = pq.ParquetFile(uri.getPath()).metadata.num_rows
                        except Exception:
                            n_rows = -1
                    partition_lineage.append({"file": name, "rows": n_rows, "bytes": size})
        if metrics is not None:
            row = {
                "run_id": self.run_id,
                "superstep": superstep,
                "bytes_checkpointed": bytes_written,
                "partitions": partition_lineage,
                "ts": time.time(),
                **metrics,
            }
            mpath = fsutil.join(self.run_dir, "metrics.jsonl")
            try:
                existing = [
                    ln
                    for ln in fsutil.read_text(self._sp(), mpath).splitlines()
                    if ln.strip()
                ]
            except FileNotFoundError:
                existing = []
            # a crashed-and-retried superstep REPLACES its earlier metrics
            # row — an append would double-count bytes/wall time for that
            # step in anything aggregating the log
            existing = [
                ln for ln in existing if json.loads(ln).get("superstep") != superstep
            ]
            fsutil.write_text(
                self._sp(), mpath, "\n".join(existing + [json.dumps(row)]) + "\n"
            )
        # Commit point: aggs.json written atomically last (tmp + rename;
        # a crash anywhere before the rename leaves the step uncommitted).
        tmp = self._aggs_path(superstep) + ".tmp"
        fsutil.write_text(
            self._sp(), tmp, json.dumps({"superstep": superstep, "aggregators": aggregators})
        )
        afs, dst = self._fs(self._aggs_path(superstep))
        if afs.exists(dst):
            afs.delete(dst, False)
        _, tmp_p = self._fs(tmp)
        afs.rename(tmp_p, dst)
        spark = state.sparkSession
        if self.state_table is not None:
            return self._read_table(spark, self.state_table, superstep)
        return spark.read.parquet(state_dir).drop("partition_id")

    # ------------------------------------------------- table backend
    def _write_table(self, df: DataFrame, table: str, superstep: int) -> None:
        """State rows → catalog table partitioned by (run_id, superstep)
        via DataFrameWriterV2. ``overwritePartitions`` replaces exactly
        the partitions present in the written frame — i.e. a re-run of
        this (run_id, superstep) — atomically in catalogs with atomic
        partition overwrite (Iceberg: one snapshot commit)."""
        full = (
            df.withColumn("partition_id", F.spark_partition_id())
            .withColumn("run_id", F.lit(self.run_id))
            .withColumn("superstep", F.lit(superstep))
        )
        if not self._sp().catalog.tableExists(table):
            (
                full.writeTo(table)
                .using(self.table_provider)
                .partitionedBy(F.col("run_id"), F.col("superstep"))
                .create()
            )
            return
        try:
            full.writeTo(table).overwritePartitions()
        except Exception as e:  # noqa: BLE001 — see the v1 gate below
            # the V2SessionCatalog CREATEs fine but registers a v1 table
            # it cannot WRITE through the v2 API; same dynamic partition
            # overwrite via the v1 writer (positional, so realign to the
            # table's column order first). A real v2 catalog (Iceberg)
            # never takes this branch.
            if "v1 table" not in str(e):
                raise
            cols = self._sp().table(table).columns
            # the state being saved may itself read from this table (a
            # resumed run: save() returns table reads); v1 rejects
            # overwrite-while-reading at table level, so cut the table
            # out of the lineage first. Iceberg's snapshot isolation
            # makes this a non-issue on the v2 path above.
            (
                full.select(*cols)
                .localCheckpoint(eager=True)
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .insertInto(table)
            )

    def _read_table(self, spark: SparkSession, table: str, superstep: int) -> DataFrame:
        return (
            spark.table(table)
            .where((F.col("run_id") == self.run_id) & (F.col("superstep") == superstep))
            .drop("partition_id", "run_id", "superstep")
        )

    def _table_lineage(self, superstep: int) -> tuple[list[dict[str, Any]], int]:
        """Rows per writing partition from the table itself (one small
        Spark job — the table backend has no one-file-per-task listing
        to read footers from). Byte sizes come from the provider's
        manifest/files metadata when it exposes one; the session-catalog
        parquet provider does not, so bytes are reported as -1 there."""
        rows = (
            self._sp()
            .table(self.state_table)
            .where((F.col("run_id") == self.run_id) & (F.col("superstep") == superstep))
            .groupBy("partition_id")  # the WRITER's partition, stamped at save
            .count()
            .collect()
        )
        lineage = [
            {"partition": int(r["partition_id"]), "rows": int(r["count"]), "bytes": -1}
            for r in sorted(rows, key=lambda r: r["partition_id"])
        ]
        return lineage, -1

    # ------------------------------------------------------------- read
    def latest_complete(self) -> int | None:
        """Highest superstep whose commit marker exists, else None."""
        fs, run_p = self._fs(self.run_dir)
        if not fs.exists(run_p):
            return None
        best = None
        for st in fs.listStatus(run_p):
            name = st.getPath().getName()
            if name.startswith("superstep="):
                k = int(name.split("=", 1)[1])
                afs, aggs_p = self._fs(self._aggs_path(k))
                if afs.exists(aggs_p) and (best is None or k > best):
                    best = k
        return best

    def load_messages(self, spark: SparkSession, superstep: int) -> DataFrame | None:
        """The combined inbox consumed by ``superstep``'s update, if it
        was checkpointed (engine ``checkpoint_messages=True``)."""
        if self.state_table is not None:
            table = f"{self.state_table}_messages"
            if not spark.catalog.tableExists(table):
                return None
            msgs = self._read_table(spark, table, superstep)
            return msgs if not msgs.isEmpty() else None
        path = fsutil.join(self._step_dir(superstep), "messages")
        fs, p = self._fs(path)
        if not fs.exists(p):
            return None
        return spark.read.parquet(path).drop("partition_id")

    def load(self, spark: SparkSession, superstep: int) -> tuple[DataFrame, dict[str, Any]]:
        aggs = json.loads(fsutil.read_text(spark, self._aggs_path(superstep)))[
            "aggregators"
        ]
        if self.state_table is not None:
            return self._read_table(spark, self.state_table, superstep), aggs
        state = spark.read.parquet(fsutil.join(self._step_dir(superstep), "state")).drop(
            "partition_id"
        )
        return state, aggs

    def metrics(self) -> list[dict[str, Any]]:
        try:
            text = fsutil.read_text(
                self._sp(), fsutil.join(self.run_dir, "metrics.jsonl")
            )
        except FileNotFoundError:
            return []
        return [json.loads(line) for line in text.splitlines() if line.strip()]
