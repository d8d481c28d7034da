"""Border/pad-invariant dedup tests — multimodal/crop.py."""

from __future__ import annotations

import numpy as np

from dedup_spark.fixtures.images import (
    _pad_image,
    _smooth_image,
    encode_ppm,
    generate_border_corpus,
)
from dedup_spark.multimodal.crop import border_trim_clusters, trim_uniform_border


def test_trim_hand_pinned():
    base = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3) + 10
    padded = _pad_image(base, 1, 2, 3, 0, (7, 7, 7))
    got = trim_uniform_border(padded)
    assert got.shape == (2, 2, 3) and (got == base).all()
    # fully uniform image keeps its whole buffer
    flat = np.full((4, 6, 3), 9, dtype=np.uint8)
    assert trim_uniform_border(flat).shape == (4, 6, 3)
    # border color also present INSIDE content: inner pixels survive
    tricky = _pad_image(base, 2, 2, 2, 2, (10, 11, 12))  # == base[0,0]
    got2 = trim_uniform_border(tricky)
    assert (got2 == base).all()


def test_cluster_assignment_by_source(spark):
    pdf = generate_border_corpus()
    df = spark.createDataFrame(
        pdf, "image_id string, src_id string, bytes binary, w int, "
        "h int, fmt string"
    )
    got = {
        r["image_id"]: r["cluster_id"]
        for r in border_trim_clusters(df.drop("src_id")).collect()
    }
    for _, row in pdf.iterrows():
        want = pdf[pdf.src_id == row["src_id"]]["image_id"].min()
        assert got[row["image_id"]] == want, row["image_id"]
    assert all(
        r["ok"] for r in border_trim_clusters(df.drop("src_id")).collect()
    )


def test_flat_images_cluster_only_when_content_equal(spark):
    flat_a = encode_ppm(np.full((4, 4, 3), 50, dtype=np.uint8))
    flat_b = encode_ppm(np.full((6, 6, 3), 50, dtype=np.uint8))
    rows = [("f1", flat_a, "ppm"), ("f2", flat_a, "ppm"),
            ("f3", flat_b, "ppm"), ("x1", b"P6\nbroken", "ppm")]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    got = {r["image_id"]: r for r in border_trim_clusters(df).collect()}
    assert got["f1"]["cluster_id"] == got["f2"]["cluster_id"] == "f1"
    assert got["f3"]["cluster_id"] == "f3"  # different dims, own cluster
    assert got["x1"]["ok"] is False and got["x1"]["cluster_id"] == "x1"


def test_double_padding_still_collapses(spark):
    # a pad around a pad (re-publication of an already-padded copy in
    # the SAME color) trims in one pass to the same content box
    base = _smooth_image(b"dbl", 10, 8)
    once = _pad_image(base, 2, 2, 2, 2, (0, 0, 0))
    twice = _pad_image(once, 3, 3, 3, 3, (0, 0, 0))
    rows = [("a", encode_ppm(base), "ppm"), ("b", encode_ppm(once), "ppm"),
            ("c", encode_ppm(twice), "ppm")]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    got = {r["image_id"]: r["cluster_id"] for r in border_trim_clusters(df).collect()}
    assert got["a"] == got["b"] == got["c"] == "a"


def test_nested_multicolor_frames_collapse(spark):
    # a white mat INSIDE a black border (nested re-publication): one
    # trim pass only strips the outer frame; the fixpoint recovers the
    # base — hypothesis found the non-idempotence, this pins the fix
    base = _smooth_image(b"nest", 10, 8)
    nested = _pad_image(
        _pad_image(base, 2, 2, 2, 2, (255, 255, 255)), 3, 3, 3, 3, (0, 0, 0)
    )
    got = trim_uniform_border(nested)
    assert got.shape == base.shape and (got == base).all()
    rows = [("a", encode_ppm(base), "ppm"), ("b", encode_ppm(nested), "ppm")]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    got2 = {r["image_id"]: r["cluster_id"] for r in border_trim_clusters(df).collect()}
    assert got2["a"] == got2["b"] == "a"
