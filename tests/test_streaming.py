"""Structured-streaming incremental dedup tests: cross-batch cluster
stability, idempotent replay, windowed monitoring aggregate."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dedup_spark.fixtures.images import IMAGES_SCHEMA, encode_ppm, phash64
from dedup_spark.streaming.incremental import (
    process_batch,
    start_incremental_dedup,
    windowed_dup_rate,
)


def _row(image_id, pixels, caption="c"):
    h, w, _ = pixels.shape
    return {
        "image_id": image_id, "bytes": encode_ppm(pixels),
        "w": w, "h": h, "fmt": "ppm", "caption": caption,
        "phash": int(phash64(pixels)),
    }


def _px(seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


def _mkdf(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows), schema=IMAGES_SCHEMA)


def test_incremental_stream_clusters_across_batches(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    px1, px2 = _px(1), _px(2)
    # batch 1: a1 + unique b1
    _mkdf(spark, [_row("a1", px1), _row("b1", px2)]).write.mode("append").parquet(in_dir)
    q = start_incremental_dedup(spark, in_dir, IMAGES_SCHEMA, state, out, ckpt)
    q.awaitTermination(120)

    # batch 2 (new file): a2 duplicates batch-1's a1 content
    _mkdf(spark, [_row("a2", px1), _row("c1", _px(3))]).write.mode("append").parquet(in_dir)
    q = start_incremental_dedup(spark, in_dir, IMAGES_SCHEMA, state, out, ckpt)
    q.awaitTermination(120)

    got = {r["image_id"]: r["cluster_id"] for r in spark.read.parquet(out).collect()}
    assert got["a1"] == got["a2"] == "a1"  # cross-batch cluster stability
    assert got["b1"] == "b1" and got["c1"] == "c1"
    assert len(got) == 4


def test_replayed_batch_is_idempotent(spark, tmp_path):
    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    batch = _mkdf(spark, [_row("x1", _px(5)), _row("x2", _px(5))])
    process_batch(spark, batch, state, out)
    first = sorted(
        (r["image_id"], r["cluster_id"]) for r in spark.read.parquet(out).collect()
    )
    process_batch(spark, batch, state, out)  # crash-replay of same batch
    second = sorted(
        (r["image_id"], r["cluster_id"]) for r in spark.read.parquet(out).collect()
    )
    assert first == second == [("x1", "x1"), ("x2", "x1")]
    # state holds exactly one row for the shared content
    assert spark.read.parquet(state).count() == 1


def test_bucketed_state_join_is_shuffle_free_on_state_side(spark, tmp_path):
    """Bucketed state store: (1) 3-batch replay through the bucketed
    path produces the same assignments as the parquet-dir path; (2) the
    per-batch state join's plan has NO Exchange feeding the state scan —
    only the micro-batch side shuffles (the state is the unbounded
    side; never re-shuffling it is the scale contract)."""
    from pyspark.sql import functions as F

    state_tbl = "inc_state_bkt_t"
    out = str(tmp_path / "outb")
    spark.sql(f"DROP TABLE IF EXISTS {state_tbl}")
    rows = [
        [_row("a1", _px(1)), _row("b1", _px(2))],
        [_row("a2", _px(1)), _row("c1", _px(3))],
        [_row("c2", _px(3)), _row("d1", _px(4))],
    ]
    for batch_rows in rows:
        process_batch(
            spark, _mkdf(spark, batch_rows), "", out,
            state_table=state_tbl, n_buckets=4,
        )
    got = {r["image_id"]: r["cluster_id"] for r in spark.read.parquet(out).collect()}
    assert got == {
        "a1": "a1", "a2": "a1", "b1": "b1", "c1": "c1", "c2": "c1", "d1": "d1",
    }
    # state: one row per distinct content
    assert spark.table(state_tbl).count() == 4

    # plan proof: probe the exact join shape process_batch builds
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        probe = _mkdf(spark, [_row("z1", _px(9))])
        from dedup_spark.streaming.incremental import _batch_hashes

        hashes = _batch_hashes(probe, "image_id", "bytes")
        joined = hashes.join(spark.table(state_tbl), on=["len", "fsha"], how="left")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # exactly ONE Exchange: the batch side; the bucketed state scan
        # feeds the join directly
        assert plan.count("Exchange") == 1
        # and the state scan reports its bucketing (the reason the
        # second Exchange is absent)
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql(f"DROP TABLE IF EXISTS {state_tbl}")


def test_windowed_dup_rate_plan_is_streaming_safe(spark, tmp_path):
    """The watermarked window agg must be an allowed streaming plan:
    start it on a file stream and drain one batch."""
    in_dir = str(tmp_path / "sin")
    schema = "ts timestamp, image_id string, bytes binary"
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(["2026-01-01 00:00:01", "2026-01-01 00:00:02"]),
            "image_id": ["a", "b"],
            "bytes": [b"same", b"same"],
        }
    )
    spark.createDataFrame(pdf, schema=schema).write.parquet(in_dir)
    stream = spark.readStream.schema(schema).format("parquet").load(in_dir)
    agg = windowed_dup_rate(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("dup_rate_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode emits only closed windows; the plan executing at all
    # (no AnalysisException) is the contract here
    assert spark.table("dup_rate_t").columns == ["window", "rows", "distinct_contents"]
