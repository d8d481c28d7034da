"""Table catalog — Iceberg when available, parquet fallback (same API).

The reference's directory scan (S1, src/scanner.rs:44-111) disappears in
Spark: the input IS a catalog table; the parallel walk becomes the
table's file manifest, and exclude-glob subtree pruning (S4) becomes
partition pruning on partition columns.

The north rule targets Iceberg tables; this sandbox has no Iceberg
runtime jar, so the writer detects it and falls back to parquet +
atomic-rename manifest while keeping the call surface identical. The
atomic temp-then-rename commit mirrors the reference's crash-safe
hardlink protocol (src/actions.rs:118-136); Iceberg gives the same
guarantee natively via snapshot commits.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one catalog table. Iceberg identifier or parquet path."""
    if "://" in sf_dir or sf_dir.startswith("catalog."):
        return spark.read.format("iceberg").load(f"{sf_dir}.{name}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    for name in names or TABLES:
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).createOrReplaceTempView(name)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> str:
    """Bucketed (hash-clustered) table write — the co-located-join path.

    Two tables bucketed on the same key with the same bucket count join
    WITHOUT a shuffle: each task reads matching buckets from both sides
    (plan shows SortMergeJoin with NO Exchange — asserted in
    tests/test_filters_catalog.py). At 100 TB this is the difference
    between re-shuffling the assignment table on every downstream join
    and never shuffling it again; the Iceberg analog is a `bucket(N,
    col)` partition transform with storage-partitioned joins. Spark's
    bucketing requires the table catalog (`saveAsTable`), so this path
    is metastore-backed parquet rather than a bare directory.
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)
    return table_name


def write_table(
    df: DataFrame,
    target: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> str:
    """Atomic table write.

    Iceberg: ``writeTo(...).createOrReplace()`` (snapshot commit is
    atomic). Parquet fallback: write to a temp dir, then atomic rename +
    manifest — a reader never observes a half-written table, the same
    invariant as the reference's temp-hardlink + rename
    (src/actions.rs:118-136).
    """
    spark = df.sparkSession
    if iceberg_available(spark) and "/" not in target:
        writer = df.writeTo(target)
        if partition_by:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        writer.createOrReplace()
        return target

    final = Path(target)
    tmp = final.with_name(f".{final.name}.tmp-{uuid.uuid4().hex[:8]}")
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(str(tmp))
    manifest = {
        "committed_at": time.time(),
        "rows": None,  # cheap commit: no extra count action
        "partition_by": partition_by or [],
        "format": "parquet",
    }
    (tmp / "_MANIFEST.json").write_text(json.dumps(manifest))
    if final.exists():
        if mode != "overwrite":
            raise FileExistsError(f"{final} exists and mode={mode}")
        shutil.rmtree(final)
    os.rename(tmp, final)
    return str(final)
