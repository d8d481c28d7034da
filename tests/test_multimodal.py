"""Multimodal plumbing tests: PPM decode is real; codec-heavy formats
are stubbed but the Spark-side schema/batch plumbing is exercised.
Includes the PSNR >= 40 dB decoded-pixel invariant (input_hint)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dedup_spark.fixtures.images import (
    IMAGES_SCHEMA,
    decode_ppm,
    encode_ppm,
    generate_corpus,
    phash64,
    to_spark,
)
from dedup_spark.multimodal.decode import (
    extract_image_features,
    frame_sample_stub,
    resize_images,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10 * np.log10(255.0**2 / mse)


def test_ppm_roundtrip_lossless():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)


def test_near_dup_generator_psnr_invariant():
    """Near-duplicate rows must decode within PSNR >= 40 dB of their
    original (input_hint per-row invariant); exact dups byte-equal."""
    corpus = generate_corpus(300, dup_ratio=0.3, near_dup_ratio=0.2, seed=5)
    imgs = corpus.images.set_index("image_id")
    truth = corpus.truth
    by_cluster = truth.groupby("cluster_id")["image_id"].apply(list)
    checked_near = 0
    for members in by_cluster:
        if len(members) < 2:
            continue
        ref = decode_ppm(imgs.loc[members[0], "bytes"])
        for other in members[1:]:
            b = imgs.loc[other, "bytes"]
            if b == imgs.loc[members[0], "bytes"]:
                continue  # exact dup: byte-equal, infinite PSNR
            px = decode_ppm(b)
            if px.shape != ref.shape:
                continue
            assert _psnr(ref, px) >= 40.0
            checked_near += 1
    assert checked_near > 0, "no near-dups generated to check"


def test_extract_features_and_unreadable_skip(spark):
    rng = np.random.default_rng(4)
    px = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    rows = [
        {
            "image_id": "ok",
            "bytes": encode_ppm(px),
            "w": 16, "h": 16, "fmt": "ppm",
            "caption": "c", "phash": int(phash64(px)),
        },
        {
            "image_id": "broken",
            "bytes": b"not an image at all",
            "w": 0, "h": 0, "fmt": "ppm",
            "caption": "c", "phash": 0,
        },
    ]
    df = spark.createDataFrame(pd.DataFrame(rows), schema=IMAGES_SCHEMA)
    got = {r["image_id"]: r for r in extract_image_features(df).collect()}
    assert got["ok"]["ok"] is True
    assert got["ok"]["recomputed_phash"] == int(phash64(px))
    assert abs(got["ok"]["mean_r"] - px[:, :, 0].mean()) < 1e-6
    assert got["broken"]["ok"] is False  # skip, don't crash (10^12 rule)
    assert got["broken"]["mean_r"] is None


def test_resize_images_shapes(spark):
    corpus = generate_corpus(20, dup_ratio=0.0, seed=9)
    imgs, _ = to_spark(spark, corpus)
    out = resize_images(imgs, 8, 8).collect()
    assert len(out) == 20
    for r in out:
        assert (r["w"], r["h"]) == (8, 8)
        assert decode_ppm(bytes(r["bytes"])).shape == (8, 8, 3)


def test_frame_sample_is_explicit_stub(spark):
    with pytest.raises(NotImplementedError):
        frame_sample_stub(None)
