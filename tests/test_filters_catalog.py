"""Scan-filter glob matrix (reference tests/glob_pattern.rs), pattern
files (S7), lineage metrics (P2), and the atomic catalog writer (O2's
crash-safe commit analog)."""

from __future__ import annotations

import json
import warnings

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dedup_spark.plans.lineage import StageMetrics, partition_lineage
from dedup_spark.sources.catalog import write_table
from dedup_spark.sources.filters import (
    apply_scan_filters,
    glob_to_regex,
    parse_pattern_file,
)


@pytest.fixture(scope="module")
def paths_df(spark):
    ids = [
        "photos/cat.jpg",
        "photos/dog.png",
        "photos/raw/cat.tmp",
        "docs/readme.txt",
        "docs/deep/nested/file.jpg",
        "backup.jpg",
    ]
    return spark.createDataFrame(
        pd.DataFrame({"image_id": ids, "bytes": [b"x" * 10] * len(ids)})
    )


def _ids(df):
    return {r["image_id"] for r in df.select("image_id").collect()}


def test_include_by_extension(spark, paths_df):
    # '*.jpg' matches basenames anywhere (reference: basename OR full path)
    got = _ids(apply_scan_filters(paths_df, include=["*.jpg"]))
    assert got == {"photos/cat.jpg", "docs/deep/nested/file.jpg", "backup.jpg"}


def test_exclude_directory_subtree(spark, paths_df):
    got = _ids(apply_scan_filters(paths_df, exclude=["photos/**"]))
    assert got == {"docs/readme.txt", "docs/deep/nested/file.jpg", "backup.jpg"}


def test_exclude_wins_over_include(spark, paths_df):
    # reference tests/glob_pattern.rs:337-364
    got = _ids(
        apply_scan_filters(paths_df, include=["*.jpg"], exclude=["photos/**"])
    )
    assert got == {"docs/deep/nested/file.jpg", "backup.jpg"}


def test_question_mark_and_charclass(spark, paths_df):
    got = _ids(apply_scan_filters(paths_df, include=["photos/?at.jpg"]))
    assert got == {"photos/cat.jpg"}
    got2 = _ids(apply_scan_filters(paths_df, include=["[cd]*.jpg"]))
    assert got2 == {"photos/cat.jpg", "photos/dog.png"} - {"photos/dog.png"}


def test_star_does_not_cross_separator(spark, paths_df):
    # literal_separator=true semantics (reference src/scanner.rs:16)
    got = _ids(apply_scan_filters(paths_df, include=["docs/*.jpg"]))
    assert got == set()  # deep/nested needs '**'
    got2 = _ids(apply_scan_filters(paths_df, include=["docs/**"]))
    assert got2 == {"docs/readme.txt", "docs/deep/nested/file.jpg"}


def test_invalid_glob_warns_and_skips():
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert glob_to_regex("[unclosed") is None
        assert any("invalid glob" in str(x.message) for x in w)


def test_pattern_file_parse(tmp_path):
    f = tmp_path / "pats.txt"
    f.write_text("# comment\n\n*.jpg\n  *.png  \n#another\n*.tmp\n")
    assert parse_pattern_file(f) == ["*.jpg", "*.png", "*.tmp"]


def test_stage_metrics_and_partition_lineage(spark):
    m = StageMetrics("t")
    with m.stage("s1"):
        pass
    m.record("rows", 42)
    entries = {(e["stage"], e["metric"]) for e in m.entries}
    assert ("s1", "wall_seconds") in entries and ("rows", "value") in entries
    mdf = m.to_dataframe(spark)
    assert mdf.count() == 2

    df = spark.range(10)
    lin = partition_lineage(df, "stageX")
    rows = lin.collect()
    assert all(r["_lineage_stage"] == "stageX" for r in rows)
    assert all(r["_lineage_partition"] >= 0 for r in rows)


def test_write_table_atomic_and_mode_guard(spark, tmp_path):
    df = spark.range(5).withColumnRenamed("id", "x")
    target = str(tmp_path / "tbl")
    write_table(df, target)
    back = spark.read.parquet(target)
    assert back.count() == 5
    assert (tmp_path / "tbl" / "_MANIFEST.json").exists()
    # overwrite succeeds atomically; append-guard raises
    write_table(df.filter(F.col("x") < 3), target)
    assert spark.read.parquet(target).count() == 3
    with pytest.raises(FileExistsError):
        write_table(df, target, mode="error")


def test_write_table_iceberg_branch(spark, monkeypatch):
    """Drive write_table through the Iceberg branch with a mocked
    catalog (no runtime jar in the sandbox): the identifier must route
    to writeTo(...).createOrReplace() — partitioned when asked — and
    never touch the parquet fallback."""
    from dedup_spark.sources import catalog

    df = spark.range(3).withColumnRenamed("id", "x")
    calls: dict = {}

    class FakeWriter:
        def partitionedBy(self, *cols):
            calls["partitioned_by"] = len(cols)
            return self

        def createOrReplace(self):
            calls["committed"] = True

    def fake_write_to(target):
        calls["target"] = target
        return FakeWriter()

    monkeypatch.setattr(catalog, "iceberg_available", lambda s: True)
    monkeypatch.setattr(
        type(df), "writeTo", lambda self, target: fake_write_to(target)
    )
    out = catalog.write_table(df, "catalog.db.tbl", partition_by=["x"])
    assert out == "catalog.db.tbl"
    assert calls == {
        "target": "catalog.db.tbl",
        "partitioned_by": 1,
        "committed": True,
    }
    # unpartitioned path commits too
    calls.clear()
    catalog.write_table(df, "catalog.db.tbl2")
    assert calls == {"target": "catalog.db.tbl2", "committed": True}


def test_partition_pruning_is_real(spark, tmp_path):
    """S4 claim: exclude-glob subtree pruning ≙ partition pruning —
    prove it mechanically: a filter on the partition column must appear
    as PartitionFilters in the scan and prune the file list (the
    pruned partition's files are never opened)."""
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "image_id": [f"img_{i}" for i in range(60)],
                "src": (["keep"] * 30 + ["vendor"] * 30),
                "n": list(range(60)),
            }
        )
    )
    p = str(tmp_path / "ptbl")
    df.write.partitionBy("src").parquet(p)
    back = spark.read.parquet(p).filter(F.col("src") == "keep")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "src" in plan.split("PartitionFilters")[1][:80]
    assert back.count() == 30
    # and the partition column never becomes a data filter (it would
    # read the files and filter rows instead of skipping whole dirs)
    pushed = plan.split("PushedFilters")[1][:120] if "PushedFilters" in plan else ""
    assert "src" not in pushed


def test_bucketed_join_is_shuffle_free(spark):
    """Bucketing proof: two tables bucketed on the same key join with
    NO Exchange on either side — the co-located-join contract that
    kills the per-join shuffle at scale."""
    import pandas as pd

    from dedup_spark.sources.catalog import write_bucketed

    a = spark.createDataFrame(
        pd.DataFrame({"k": list(range(500)), "va": list(range(500))})
    )
    b = spark.createDataFrame(
        pd.DataFrame({"k": list(range(0, 500, 2)), "vb": list(range(250))})
    )
    write_bucketed(a, "bkt_a", ["k"], 8, sort_cols=["k"])
    write_bucketed(b, "bkt_b", ["k"], 8, sort_cols=["k"])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle at all
        assert joined.count() == 250
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")
