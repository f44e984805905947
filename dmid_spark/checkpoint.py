"""Superstep checkpointing with lineage + convergence metrics.

The reference's BSP has no resumability: a failed Giraph job restarts from
superstep 0. Here every iteration of a driver loop can persist its vertex
state as a table plus a lineage record (iteration number, per-partition file
manifest, convergence metrics, wall-clock), so any run is resumable
mid-iteration and throughput numbers are reproducible from run artifacts
alone (BASELINE.md measurement plan).

Backend is plain Parquet + a JSONL lineage log. The write/read surface is
isolated here so an Iceberg catalog (not on this sandbox's classpath) can be
dropped in by swapping ``_write``/``_read``.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class CheckpointManager:
    """Per-run checkpoint directory with a JSONL lineage log.

    Layout::

        <base>/<run_id>/
            lineage.jsonl            # one record per committed checkpoint
            <name>_it<k>/            # parquet state table
    """

    def __init__(self, spark: SparkSession, base_dir: str, run_id: str = "run"):
        self.spark = spark
        self.dir = os.path.join(base_dir, run_id)
        os.makedirs(self.dir, exist_ok=True)
        self._log = os.path.join(self.dir, "lineage.jsonl")

    # -- write ------------------------------------------------------------
    def save(
        self, df: DataFrame, name: str, iteration: int, metrics: dict[str, Any] | None = None
    ) -> DataFrame:
        """Persist state; returns a fresh DataFrame reading the checkpoint
        (truncating the iterative logical plan — Catalyst does not bound
        lineage growth across loop iterations)."""
        path = os.path.join(self.dir, f"{name}_it{iteration}")
        t0 = time.time()
        df.write.mode("overwrite").parquet(path)
        wall = time.time() - t0
        record = {
            "name": name,
            "iteration": iteration,
            "path": path,
            "wall_sec": round(wall, 4),
            "ts": time.time(),
            "partitions": self._manifest(path),
            "metrics": metrics or {},
            "committed": True,
        }
        with open(self._log, "a") as f:
            f.write(json.dumps(record) + "\n")
        return self.spark.read.parquet(path)

    @staticmethod
    def _manifest(path: str) -> list[dict[str, Any]]:
        """Per-partition lineage: the parquet part files backing the state."""
        out = []
        for fn in sorted(os.listdir(path)):
            if fn.startswith("part-"):
                out.append({"file": fn, "bytes": os.path.getsize(os.path.join(path, fn))})
        return out

    # -- read / resume -----------------------------------------------------
    def lineage(self, name: str | None = None) -> list[dict[str, Any]]:
        if not os.path.exists(self._log):
            return []
        recs = [json.loads(line) for line in open(self._log)]
        return [r for r in recs if name is None or r["name"] == name]

    def latest(self, name: str) -> tuple[int, DataFrame, dict[str, Any]] | None:
        """Most recent committed checkpoint for ``name`` (for resume)."""
        recs = [r for r in self.lineage(name) if r.get("committed")]
        if not recs:
            return None
        rec = max(recs, key=lambda r: r["iteration"])
        return rec["iteration"], self.spark.read.parquet(rec["path"]), rec["metrics"]
