"""Per-partition lineage / metrics checkpoint table — resumable runs.

The reference persists per-run metrics as append-mode CSVs
(/root/reference/pipelines/experiment/experiment.py:494-502,533-539) and
joblib-dumps fitted models (pipelines/runs.py:164-168). The engine's
resumability is table-native instead: every completed partition appends a
(run_id, part, status, n_rows, n_violations, wall_sec) row; a resumed run
anti-joins the completed set and processes only the remainder.

The sandbox backend is an append-only parquet directory (each mark() call
writes a new file — the same append semantics an Iceberg table gives via
snapshot appends; swap `CheckpointTable` for a `df.writeTo(...).append()`
on a real catalog). Idempotence: completed_parts() de-duplicates on
(run_id, part), so a re-marked partition is harmless.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from autoprepad_spark.schema import CHECKPOINT_SCHEMA


class CheckpointTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            f.endswith(".parquet") for f in _walk_files(self.path)
        )

    def read(self) -> DataFrame:
        if not self._exists():
            return self.spark.createDataFrame([], schema=CHECKPOINT_SCHEMA)
        return self.spark.read.schema(CHECKPOINT_SCHEMA).parquet(self.path)

    def completed_parts(self, run_id: str) -> list[str]:
        rows = (
            self.read()
            .filter((F.col("run_id") == run_id) & (F.col("status") == "done"))
            .select("part")
            .distinct()
            .collect()
        )
        return sorted(r["part"] for r in rows)

    def mark(
        self,
        run_id: str,
        parts: list[tuple[str, int, int, float]],
        status: str = "done",
    ) -> None:
        """parts: [(part, n_rows, n_violations, wall_sec), ...] — one append."""
        rows = [(run_id, p, status, int(n), int(v), float(w)) for p, n, v, w in parts]
        df = self.spark.createDataFrame(rows, schema=CHECKPOINT_SCHEMA)
        df.coalesce(1).write.mode("append").parquet(self.path)

    def remaining(self, df: DataFrame, run_id: str) -> DataFrame:
        """Filter the fact table to partitions not yet completed.

        Expressed as a partition-column IN-filter (not an anti-join on
        rows) so Iceberg/parquet PARTITION PRUNING skips completed
        partitions' files entirely — resume costs no scan of done work.
        """
        done = self.completed_parts(run_id)
        if not done:
            return df
        return df.filter(~F.col("part").isin(done))


def _walk_files(root: str):
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            yield os.path.join(dirpath, f)


def new_run_id() -> str:
    return uuid.uuid4().hex[:12]
