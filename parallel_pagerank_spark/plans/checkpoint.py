"""Durable superstep checkpointing with a JSON manifest.

North-rule requirement: iterative loops must be resumable from checkpoint
with per-partition lineage and convergence metrics. The reference has no
counterpart (all MPI state is process memory); this is engine-level work —
Catalyst has no fixpoint operator (SURVEY.md §4.3).

Layout under ``checkpoint_dir``:
    <name>/manifest.json             — list of superstep records
    <name>/step_<iteration>/         — parquet snapshot of the state DF

Each manifest record carries the iteration number, convergence metrics so
far, and per-partition row counts (the partition lineage of the snapshot).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F


class SuperstepCheckpointer:
    def __init__(self, checkpoint_dir: str | None, name: str):
        self.enabled = checkpoint_dir is not None
        self.base = os.path.join(checkpoint_dir, name) if self.enabled else None

    def _manifest_path(self) -> str:
        return os.path.join(self.base, "manifest.json")

    def step_path(self, iteration: int) -> str:
        return os.path.join(self.base, f"step_{iteration:06d}")

    def _read_manifest(self) -> list[dict]:
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)
        except (OSError, ValueError):
            return []

    def save(
        self,
        state: DataFrame,
        iteration: int,
        metrics: list[dict],
        converged: bool = False,
    ) -> None:
        if not self.enabled:
            return
        path = os.path.join(self.base, f"step_{iteration:06d}")
        state.write.mode("overwrite").parquet(path)
        # per-partition lineage: row count per output partition of the
        # snapshot, keyed by the physical partition id it came from
        part_counts = [
            {"partition": r["pid"], "rows": r["rows"]}
            for r in state.groupBy(
                F.spark_partition_id().alias("pid")
            )
            .agg(F.count("*").alias("rows"))
            .orderBy("pid")
            .collect()
        ]
        manifest = self._read_manifest()
        manifest = [m for m in manifest if m["iteration"] != iteration]
        manifest.append(
            {
                "iteration": iteration,
                "path": path,
                "converged": converged,
                "metrics": metrics,
                "partitions": part_counts,
            }
        )
        manifest.sort(key=lambda m: m["iteration"])
        os.makedirs(self.base, exist_ok=True)
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path())

    def load_latest(
        self, spark: SparkSession
    ) -> tuple[DataFrame, int, list[dict], bool] | None:
        """Return (state DF, iteration, metrics, converged) of the newest
        snapshot."""
        if not self.enabled:
            return None
        manifest = self._read_manifest()
        if not manifest:
            return None
        last = manifest[-1]
        df = spark.read.parquet(last["path"])
        return (
            df,
            last["iteration"],
            list(last["metrics"]),
            bool(last.get("converged", False)),
        )
