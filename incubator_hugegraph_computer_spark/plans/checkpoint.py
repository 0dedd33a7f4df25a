"""Per-superstep checkpoint + resume with lineage and counters.

Mirrors the reference's snapshot semantics
(``computer-core/.../snapshot/SnapshotManager.java:54-246``: per-partition
vertex/edge/message snapshots to object storage) and its per-superstep
status/value files (``FileGraphPartition.java:286-313``): a superstep is
durable iff its state table, aggregator values and metrics row are all
committed.

Layout (parquet; on a cluster this directory would be an Iceberg table
partitioned by (run_id, superstep) — parquet-with-directory-partitioning
keeps the identical layout without requiring the Iceberg runtime jar in
this sandbox):

    <root>/<run_id>/superstep=<k>/state/*.parquet   (+ partition lineage col)
    <root>/<run_id>/superstep=<k>/aggs.json          (aggregators, atomic rename)
    <root>/<run_id>/metrics.jsonl                    (one row per superstep)

``aggs.json`` is written last and atomically — its presence marks the
superstep complete (the commit point), so a kill mid-write never yields
a half-checkpoint that resume would trust.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F


class CheckpointManager:
    def __init__(self, root: str, run_id: str, every: int = 1):
        self.root = root
        self.run_id = run_id
        self.every = max(1, every)
        self.run_dir = os.path.join(root, run_id)
        os.makedirs(self.run_dir, exist_ok=True)

    # ------------------------------------------------------------ paths
    def _step_dir(self, superstep: int) -> str:
        return os.path.join(self.run_dir, f"superstep={superstep}")

    def _aggs_path(self, superstep: int) -> str:
        return os.path.join(self._step_dir(superstep), "aggs.json")

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
        state_dir = os.path.join(step_dir, "state")
        if os.path.exists(step_dir):
            shutil.rmtree(step_dir)  # re-running a step overwrites a partial attempt
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
                .parquet(os.path.join(step_dir, "messages"))
            )
        # Per-partition lineage from the parquet footers (driver-side,
        # no extra Spark job): one part-file per write task, rows from
        # the footer, so each checkpoint records which partition wrote
        # how many state rows / bytes — SnapshotManager's per-partition
        # snapshot manifest.
        partition_lineage = []
        bytes_written = 0
        for dp, _, fs in os.walk(state_dir):
            for f in sorted(fs):
                path = os.path.join(dp, f)
                size = os.path.getsize(path)
                bytes_written += size
                if f.endswith(".parquet"):
                    try:
                        import pyarrow.parquet as pq

                        n_rows = pq.ParquetFile(path).metadata.num_rows
                    except Exception:
                        n_rows = -1
                    partition_lineage.append({"file": f, "rows": n_rows, "bytes": size})
        if metrics is not None:
            row = {
                "run_id": self.run_id,
                "superstep": superstep,
                "bytes_checkpointed": bytes_written,
                "partitions": partition_lineage,
                "ts": time.time(),
                **metrics,
            }
            with open(os.path.join(self.run_dir, "metrics.jsonl"), "a") as fh:
                fh.write(json.dumps(row) + "\n")
        # Commit point: aggs.json written atomically last.
        tmp = self._aggs_path(superstep) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"superstep": superstep, "aggregators": aggregators}, fh)
        os.replace(tmp, self._aggs_path(superstep))
        spark = state.sparkSession
        return spark.read.parquet(state_dir).drop("partition_id")

    # ------------------------------------------------------------- read
    def latest_complete(self) -> int | None:
        """Highest superstep whose commit marker exists, else None."""
        best = None
        if not os.path.isdir(self.run_dir):
            return None
        for name in os.listdir(self.run_dir):
            if name.startswith("superstep="):
                k = int(name.split("=", 1)[1])
                if os.path.exists(self._aggs_path(k)) and (best is None or k > best):
                    best = k
        return best

    def load_messages(self, spark: SparkSession, superstep: int) -> DataFrame | None:
        """The combined inbox consumed by ``superstep``'s update, if it
        was checkpointed (engine ``checkpoint_messages=True``)."""
        path = os.path.join(self._step_dir(superstep), "messages")
        if not os.path.isdir(path):
            return None
        return spark.read.parquet(path).drop("partition_id")

    def load(self, spark: SparkSession, superstep: int) -> tuple[DataFrame, dict[str, Any]]:
        with open(self._aggs_path(superstep)) as fh:
            aggs = json.load(fh)["aggregators"]
        state = spark.read.parquet(os.path.join(self._step_dir(superstep), "state")).drop(
            "partition_id"
        )
        return state, aggs

    def metrics(self) -> list[dict[str, Any]]:
        path = os.path.join(self.run_dir, "metrics.jsonl")
        if not os.path.exists(path):
            return []
        with open(path) as fh:
            return [json.loads(line) for line in fh if line.strip()]
