"""Rotation/flip-invariant dedup tests — multimodal/rotinv.py."""

from __future__ import annotations

import numpy as np

from dedup_spark.fixtures.images import (
    _smooth_image,
    encode_ppm,
    generate_rotation_corpus,
)
from dedup_spark.multimodal.rotinv import (
    multiset_signature,
    rotation_invariant_clusters,
)


def test_signature_invariant_under_all_eight_transforms():
    base = _smooth_image(b"d8", 10, 6)
    sig = multiset_signature(base)
    for k in range(4):
        r = np.rot90(base, k)
        assert multiset_signature(np.ascontiguousarray(r)) == sig
        assert multiset_signature(np.ascontiguousarray(r[:, ::-1])) == sig
    # a single changed pixel changes the signature
    mod = base.copy()
    mod[0, 0, 0] ^= 1
    assert multiset_signature(mod) != sig
    # same multiset, different pixel COUNT must differ (shape guard)
    tiled = np.concatenate([base, base], axis=0)
    assert multiset_signature(tiled) != sig


def test_cluster_assignment_by_source(spark):
    pdf = generate_rotation_corpus()
    df = spark.createDataFrame(
        pdf, "image_id string, src_id string, bytes binary, w int, "
        "h int, fmt string"
    )
    got = {
        r["image_id"]: r["cluster_id"]
        for r in rotation_invariant_clusters(df.drop("src_id")).collect()
    }
    for _, row in pdf.iterrows():
        want = pdf[pdf.src_id == row["src_id"]]["image_id"].min()
        assert got[row["image_id"]] == want


def test_unreadable_rows_survive(spark):
    base = _smooth_image(b"ok", 8, 8)
    rows = [("a", encode_ppm(base), "ppm"),
            ("b", encode_ppm(np.ascontiguousarray(np.rot90(base))), "ppm"),
            ("x", b"P6\nbroken", "ppm")]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    got = {r["image_id"]: r for r in rotation_invariant_clusters(df).collect()}
    assert got["a"]["cluster_id"] == got["b"]["cluster_id"] == "a"
    assert got["x"]["ok"] is False and got["x"]["cluster_id"] == "x"
