"""JPEG recompression dedup tests."""

from __future__ import annotations

import __spark_entry__ as e
from dedup_spark.fixtures.images import generate_recompress_corpus


def test_recompression_clusters_by_source(spark):
    pdf = generate_recompress_corpus()
    got = {
        r["image_id"]: r["cluster_id"]
        for r in e.q_recompression_dedup(spark, "unused").collect()
    }
    assert len(got) == len(pdf)
    for _, row in pdf.iterrows():
        want = pdf[pdf.src_id == row["src_id"]]["image_id"].min()
        assert got[row["image_id"]] == want, row["image_id"]


def test_exactness_tiers_all_split_recompressed_variants(spark):
    # the reason this tier exists: every exactness signature differs
    # across the variants of ONE source
    import hashlib

    from dedup_spark.multimodal.decode import _decode_any

    pdf = generate_recompress_corpus()
    one = pdf[pdf.src_id == pdf.src_id.iloc[0]]
    byte_keys = {hashlib.sha256(b).hexdigest() for b in one["bytes"]}
    assert len(byte_keys) == len(one)
    pixel_keys = set()
    for _, row in one.iterrows():
        px = _decode_any(row["bytes"], row["fmt"])
        pixel_keys.add(hashlib.sha256(px.tobytes()).hexdigest())
    assert len(pixel_keys) == len(one)  # lossy: every buffer differs
