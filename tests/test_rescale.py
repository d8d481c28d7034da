"""Scale-invariant thumbprint dedup (multimodal/decode.py
thumbprint_clusters + fixtures/images.generate_rescale_corpus)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from dedup_spark.fixtures.images import (
    RESCALE_DIMS,
    encode_ppm,
    generate_rescale_corpus,
)
from dedup_spark.multimodal.decode import thumbprint_clusters


def _clusters(spark, pdf):
    df = spark.createDataFrame(
        pdf, "image_id string, bytes binary, w int, h int, fmt string"
    )
    return {r.image_id: r for r in thumbprint_clusters(df).collect()}


def test_variants_collapse_sources_stay_apart(spark):
    pdf = generate_rescale_corpus(n_src=6)[
        ["image_id", "bytes", "w", "h", "fmt"]
    ]
    out = _clusters(spark, pdf)
    assert len(out) == 6 * len(RESCALE_DIMS)
    # every variant of a source lands in that source's cluster...
    for rid, row in out.items():
        assert row.ok
        assert row.cluster_id == f"{rid.split('#')[0]}#16"  # min id: #16 < #32 < #64
    # ...and the 6 sources form exactly 6 clusters
    assert len({r.cluster_id for r in out.values()}) == 6


def test_sampler_composition_law():
    """The exactness contract: (64 -> d -> 8) picks the same source
    pixels as (64 -> 8) whenever 8 | d | 64 — and does NOT for a
    non-dividing intermediate (the near-dup regime)."""
    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)

    def sample(px, out):
        idx = (np.arange(out) * px.shape[0]) // out
        return px[np.ix_(idx, idx)]

    direct = sample(base, 8)
    for d in (64, 32, 16):
        assert np.array_equal(sample(sample(base, d), 8), direct)
    # a non-composing intermediate (64 -> 12 -> 8: 12*j//8 floors off
    # the 8-grid) lands on different source pixels — the near-dup regime
    assert not np.array_equal(sample(sample(base, 12), 8), direct)


def test_undecodable_row_self_clusters(spark):
    pdf = generate_rescale_corpus(n_src=2)[
        ["image_id", "bytes", "w", "h", "fmt"]
    ]
    bad = pd.DataFrame(
        [("broken", b"P6\n8 8\n255\n", 8, 8, "ppm")],  # truncated payload
        columns=pdf.columns,
    )
    out = _clusters(spark, pd.concat([pdf, bad], ignore_index=True))
    assert out["broken"].ok is False
    assert out["broken"].cluster_id == "broken"
    assert len({r.cluster_id for r in out.values()}) == 3


def test_thumbprint_is_byte_dedup_blind_spot(spark):
    """The tier exists because nothing byte-level can catch this: the
    variants have pairwise-different lengths AND different pixel
    buffers, yet one thumbprint."""
    pdf = generate_rescale_corpus(n_src=1)
    lens = pdf["bytes"].map(len)
    assert lens.nunique() == len(RESCALE_DIMS)
    out = _clusters(spark, pdf[["image_id", "bytes", "w", "h", "fmt"]])
    assert len({r.cluster_id for r in out.values()}) == 1
