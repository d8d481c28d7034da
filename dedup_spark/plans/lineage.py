"""Per-stage lineage + metrics (north rule: "per-partition lineage +
metrics" on the materialized cluster table).

The reference's progress accounting is an AtomicUsize + progress bars
(src/main.rs:129-141,173-186); at cluster scale that becomes a structured
metrics table: one row per (run_id, stage, metric) with wall-clock and
row counts, written next to the output so every cluster assignment is
traceable to the stage timings that produced it.
"""

from __future__ import annotations

import json
import time
import uuid
from contextlib import contextmanager
from pathlib import Path
from typing import Any


class StageMetrics:
    """Lightweight driver-side stage metric recorder.

    Usage:
        m = StageMetrics("exact_dedup")
        with m.stage("stage1_size_group"):
            ...
        m.record("candidates", df.count())
        m.write(path)  # JSON manifest
    """

    def __init__(self, pipeline: str, run_id: str | None = None):
        self.pipeline = pipeline
        self.run_id = run_id or uuid.uuid4().hex[:12]
        self.entries: list[dict[str, Any]] = []

    @contextmanager
    def stage(self, name: str):
        t0 = time.monotonic()
        try:
            yield self
        finally:
            self.entries.append(
                {
                    "run_id": self.run_id,
                    "pipeline": self.pipeline,
                    "stage": name,
                    "metric": "wall_seconds",
                    "value": round(time.monotonic() - t0, 4),
                    "at": time.time(),
                }
            )

    def record(self, name: str, value: float) -> None:
        self.entries.append(
            {
                "run_id": self.run_id,
                "pipeline": self.pipeline,
                "stage": name,
                "metric": "value",
                "value": value,
                "at": time.time(),
            }
        )

    def to_dataframe(self, spark):
        return spark.createDataFrame(
            [(e["run_id"], e["pipeline"], e["stage"], e["metric"], float(e["value"]), e["at"]) for e in self.entries],
            schema="run_id string, pipeline string, stage string, metric string, value double, at double",
        )

    def write(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps(self.entries, indent=2))


def partition_lineage(df, stage: str):
    """Attach per-partition lineage columns to a DataFrame: the Spark
    partition id and the stage tag — written with the cluster table so
    every output row records which partition of which stage produced it.
    Built-in spark_partition_id(): zero-cost, codegen'd."""
    from pyspark.sql import functions as F

    return df.withColumn("_lineage_partition", F.spark_partition_id()).withColumn(
        "_lineage_stage", F.lit(stage)
    )
