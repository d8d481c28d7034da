"""From-scratch lossless-WebP (VP8L) codec tests — multimodal/webp.py.

The container ships no independent webp decoder (unlike png.py, whose
inflate is stdlib zlib), so beyond exact roundtrips these tests pin the
cross-format contract: the SAME pixels through the independently
verifiable PNG path and through VP8L must decode identical, so a
convention slip that self-cancels inside the webp roundtrip still
cannot change a pixel identity (crossformat_pixel_dedup's gate).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dedup_spark.multimodal.png import decode_png, encode_png
from dedup_spark.multimodal.webp import (
    _slot_base_extra,
    _value_to_slot,
    decode_webp_lossless,
    encode_webp_lossless,
)


def _rand(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


def test_roundtrip_noise_rgb():
    px = _rand((37, 53, 3), 7)
    assert np.array_equal(decode_webp_lossless(encode_webp_lossless(px)), px)


def test_roundtrip_exercises_all_symbol_kinds():
    """Flat regions force LZ77 copies, a small palette forces
    color-cache hits, and boundaries force literals — one image through
    all three green-code symbol classes."""
    px = np.zeros((40, 40, 3), dtype=np.uint8)
    px[:20] = (10, 200, 30)
    px[20:, :20] = (10, 200, 30)  # cache hit after an interruption
    px[20:, 20:] = _rand((20, 20, 3), 3)  # literals
    data = encode_webp_lossless(px)
    assert np.array_equal(decode_webp_lossless(data), px)
    # the flat half must actually compress (LZ77 is live, not dead code)
    assert len(data) < px.nbytes // 2


def test_greyscale_replicates_channels():
    g = _rand((20, 31), 11)
    out = decode_webp_lossless(encode_webp_lossless(g))
    assert np.array_equal(out, np.repeat(g[:, :, None], 3, axis=2))


def test_flat_image_is_tiny():
    px = np.full((64, 64, 3), 129, dtype=np.uint8)
    data = encode_webp_lossless(px)
    assert np.array_equal(decode_webp_lossless(data), px)
    assert len(data) < 64  # 12 KiB of pixels -> RIFF header + a few tokens


def test_single_pixel():
    px = _rand((1, 1, 3), 5)
    assert np.array_equal(decode_webp_lossless(encode_webp_lossless(px)), px)


def test_cross_format_pixel_identity_vs_png():
    """The anti-self-referential gate: webp's decode must agree with
    the PNG path (whose DEFLATE side is stdlib zlib, independent of
    this repo) pixel for pixel."""
    for seed in range(5):
        px = _rand((23, 17, 3), seed)
        via_png = decode_png(encode_png(px))
        via_webp = decode_webp_lossless(encode_webp_lossless(px))
        assert np.array_equal(via_png, via_webp)


@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31),
    style=st.sampled_from(["noise", "palette", "runs"]),
)
@settings(max_examples=25, deadline=None)
def test_roundtrip_property(w, h, seed, style):
    rng = np.random.default_rng(seed)
    if style == "noise":
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    elif style == "palette":
        pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
        px = pal[rng.integers(0, 4, (h, w))]
    else:  # horizontal runs
        col = rng.integers(0, 256, (h, 1, 3), dtype=np.uint8)
        px = np.repeat(col, w, axis=1)
    assert np.array_equal(decode_webp_lossless(encode_webp_lossless(px)), px)


def test_rejects_non_webp_and_lossy():
    with pytest.raises(ValueError):
        decode_webp_lossless(b"not a riff container at all")
    # a syntactically valid RIFF/WEBP holding a lossy VP8 chunk
    lossy = b"RIFF" + struct.pack("<I", 16) + b"WEBP" + b"VP8 " + struct.pack(
        "<I", 4
    ) + b"\x00\x00\x00\x00"
    with pytest.raises(ValueError):
        decode_webp_lossless(lossy)


def test_rejects_truncation():
    data = encode_webp_lossless(_rand((16, 16, 3), 1))
    with pytest.raises(ValueError):
        decode_webp_lossless(data[: len(data) // 2])


def test_rejects_oversized_dims():
    with pytest.raises(ValueError):
        encode_webp_lossless(np.zeros((1, 1 << 15, 3), dtype=np.uint8))


def test_prefix_value_scheme_is_self_inverse():
    """slot->(base, extra) and value->(slot, extra, payload) must agree
    over the whole 40-slot distance range (spec's shared length/distance
    prefix-value coding)."""
    for slot in range(40):
        base, extra = _slot_base_extra(slot)
        for payload in {0, (1 << extra) - 1}:
            v = base + payload
            assert _value_to_slot(v, 40) == (slot, extra, payload)
    # plain-distance pivot used by the encoder: distance 1 -> code 121
    slot, extra, payload = _value_to_slot(121, 40)
    base, e2 = _slot_base_extra(slot)
    assert base + payload == 121 and e2 == extra


def test_decode_any_routes_webp():
    from dedup_spark.multimodal.decode import _decode_any

    px = _rand((9, 9, 3), 2)
    assert np.array_equal(_decode_any(encode_webp_lossless(px), "webp"), px)
    # unreadable-row skip semantics (reference src/hasher.rs:57-60)
    assert _decode_any(b"RIFFgarbage", "webp") is None
