"""Superstep state management for iterative fixpoint loops.

Catalyst has no fixpoint operator (SURVEY.md §4.3); every iterative
operator (PageRank, CC, LPA) runs a driver-side loop whose per-superstep
state DataFrame must (a) stay hash-partitioned on its key so the join
against the persisted edge table is zero-shuffle, (b) be persisted so the
next superstep reuses it, and (c) have its lineage truncated periodically
(parquet round-trip) so plan size stays bounded — each superstep references
the previous state TWICE (gather join + update join), so the logical plan
DOUBLES per superstep: 2^interval copies of the post-truncation base plan.
interval=5 caps that at 32 copies of a ~15-node scan plan; larger intervals
OOM the driver on long runs. This class owns that
lifecycle, including pruning scratch snapshots and wiring the durable
checkpoint manifest when one is configured.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

from .checkpoint import SuperstepCheckpointer


class SuperstepState:
    def __init__(
        self,
        num_partitions: int,
        key: str,
        checkpointer: SuperstepCheckpointer | None = None,
        truncate_interval: int = 5,
    ):
        self.num_partitions = num_partitions
        self.key = key
        self.ckpt = checkpointer
        self.interval = truncate_interval
        self._scratch = None
        self._prev_scratch_path = None
        self.df: DataFrame | None = None

    def init(self, df: DataFrame) -> DataFrame:
        self.df = df.repartition(self.num_partitions, self.key).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        return self.df

    def advance(
        self,
        new_df: DataFrame,
        iteration: int,
        metrics: list[dict],
        converged: bool,
    ) -> DataFrame:
        """Install the new superstep state (assumed just materialized by the
        caller's metrics action); truncate lineage every ``interval``."""
        old = self.df
        self.df = new_df
        durable = self.ckpt is not None and self.ckpt.enabled
        if converged or iteration % self.interval == 0:
            spark = new_df.sparkSession
            if durable:
                self.ckpt.save(
                    new_df, iteration, metrics, converged=converged
                )
                path = self.ckpt.step_path(iteration)
            else:
                if self._scratch is None:
                    self._scratch = tempfile.mkdtemp(prefix="superstep_")
                path = f"{self._scratch}/step_{iteration:06d}"
                new_df.write.mode("overwrite").parquet(path)
            new_df.unpersist()
            self.df = (
                spark.read.parquet(path)
                .repartition(self.num_partitions, self.key)
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            self.df.count()
            if self._prev_scratch_path is not None:
                shutil.rmtree(self._prev_scratch_path, ignore_errors=True)
            if not durable:
                self._prev_scratch_path = path
        if old is not None:
            old.unpersist()
        return self.df
