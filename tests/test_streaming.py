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
