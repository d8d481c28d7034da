"""From-scratch TIFF 6.0 LZW codec tests — multimodal/tiff.py.

Like webp.py, the container ships no independent TIFF reader, so beyond
exact roundtrips these tests pin the cross-format contract (same pixels
through the independently verifiable PNG path must decode identical —
crossformat_pixel_dedup's gate) and drive every spec mechanism
explicitly: early-change width transitions, the 4094-entry table reset,
both endiannesses, multi-strip assembly, the horizontal predictor, and
the KwKwK decoder case.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dedup_spark.multimodal.png import decode_png, encode_png
from dedup_spark.multimodal.tiff import (
    ROWS_PER_STRIP,
    decode_tiff,
    encode_tiff,
    lzw_decode,
    lzw_encode,
)


def _rand(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


# ----------------------------------------------------------- LZW core ---


def test_lzw_basic_roundtrips():
    for data in (
        b"",
        b"a",
        b"aaaaaaaaaaaaaaa",  # KwKwK-heavy
        b"TOBEORNOTTOBEORTOBEORNOT",
        bytes(range(256)) * 4,
    ):
        assert lzw_decode(lzw_encode(data)) == data


def test_lzw_width_transitions_and_table_reset():
    """Low-entropy data long enough to cross every width boundary
    (511/1023/2047 early change) and trigger the 4094-entry ClearCode
    reset at least once."""
    rng = np.random.default_rng(11)
    data = bytes(rng.integers(0, 2, 60_000, dtype=np.uint8))
    enc = lzw_encode(data)
    assert lzw_decode(enc) == data
    assert len(enc) < len(data)  # binary alphabet must compress


def test_lzw_flush_boundary_widths():
    """The encoder's final Ω flush adds no table entry but the decoder
    still adds one and may widen before EOI — lengths chosen to land
    the flush exactly on width boundaries (the fuzz-found off-by-one)."""
    rng = np.random.default_rng(5)
    for n in (250, 251, 252, 253, 254, 255, 507, 508, 509, 765, 1021):
        for trial in range(6):
            data = bytes(rng.integers(0, 2, n, dtype=np.uint8))
            assert lzw_decode(lzw_encode(data)) == data, (n, trial)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=3000))
def test_lzw_roundtrip_property(data):
    assert lzw_decode(lzw_encode(data)) == data


def test_lzw_rejects_truncation_and_bad_codes():
    enc = lzw_encode(b"hello world hello world")
    with pytest.raises(ValueError):
        lzw_decode(enc[: len(enc) // 2])
    # a code far beyond the table: craft 9-bit CLEAR then 9-bit 300
    acc = (256 << 9) | 300
    bad = int.to_bytes(acc << 6, 3, "big")
    with pytest.raises(ValueError):
        lzw_decode(bad)


# --------------------------------------------------------- container ---


def test_tiff_roundtrip_both_endians():
    px = _rand((50, 37, 3), 42)
    for endian in ("II", "MM"):
        data = encode_tiff(px, endian)
        assert data[:2] == endian.encode()
        assert np.array_equal(decode_tiff(data), px)


def test_tiff_multi_strip_and_partial_last_strip():
    # 3 full strips + a 2-row tail strip
    px = _rand((3 * ROWS_PER_STRIP + 2, 21, 3), 9)
    assert np.array_equal(decode_tiff(encode_tiff(px)), px)


def test_tiff_single_row_image():
    px = _rand((1, 300, 3), 1)
    assert np.array_equal(decode_tiff(encode_tiff(px)), px)


def test_tiff_predictor_actually_helps_gradients():
    """Smooth gradients are the predictor's reason to exist: with
    horizontal differencing the LZW input collapses to near-constant
    deltas and must compress far below raw size."""
    x = np.linspace(0, 255, 200).astype(np.uint8)
    px = np.stack([np.tile(x, (64, 1))] * 3, axis=2)
    data = encode_tiff(px)
    assert np.array_equal(decode_tiff(data), px)
    assert len(data) < px.nbytes // 4


def test_tiff_flat_image_kwkwk():
    px = np.zeros((33, 33, 3), np.uint8)
    assert np.array_equal(decode_tiff(encode_tiff(px)), px)


def test_tiff_uncompressed_and_no_predictor_decode():
    """The decoder is general over the baseline-RGB family, not just
    this encoder's output: hand-build a Compression=1 / Predictor=1
    single-strip file and decode it."""
    px = _rand((5, 4, 3), 3)
    raw = px.tobytes()
    e = "<"
    entries = [
        (256, 4, 1, struct.pack("<I", 4)),
        (257, 4, 1, struct.pack("<I", 5)),
        (258, 3, 3, None),  # out-of-line
        (259, 3, 1, struct.pack("<HH", 1, 0)),
        (262, 3, 1, struct.pack("<HH", 2, 0)),
        (273, 4, 1, struct.pack("<I", 8)),
        (277, 3, 1, struct.pack("<HH", 3, 0)),
        (278, 4, 1, struct.pack("<I", 5)),
        (279, 4, 1, struct.pack("<I", len(raw))),
    ]
    bits_off = 8 + len(raw)
    ifd_off = bits_off + 6
    body = bytearray()
    body += struct.pack(f"{e}H", len(entries))
    for tag, typ, count, val in entries:
        if val is None:
            val = struct.pack("<I", bits_off)
        body += struct.pack(f"{e}HHI", tag, typ, count) + val
    body += struct.pack(f"{e}I", 0)
    data = (
        b"II" + struct.pack("<HI", 42, ifd_off)
        + raw
        + struct.pack("<3H", 8, 8, 8)
        + bytes(body)
    )
    assert np.array_equal(decode_tiff(data), px)


def test_tiff_rejects_malformed():
    px = _rand((8, 8, 3), 0)
    good = encode_tiff(px)
    with pytest.raises(ValueError):
        decode_tiff(b"XX" + good[2:])  # bad byte-order mark
    with pytest.raises(ValueError):
        decode_tiff(good[:6])  # short header
    with pytest.raises(ValueError):
        decode_tiff(b"II" + struct.pack("<HI", 43, 8))  # bad magic
    with pytest.raises(ValueError):
        encode_tiff(px.astype(np.uint16))  # wrong dtype
    with pytest.raises(ValueError):
        encode_tiff(px, "XX")  # bad endian


def test_tiff_cross_format_pixel_identity():
    """The anti-self-cancellation gate: the same pixels through the
    independently verifiable PNG path (stdlib zlib) and through this
    codec must decode bit-identical."""
    px = _rand((40, 40, 3), 77)
    via_png = decode_png(encode_png(px))
    via_tiff = decode_tiff(encode_tiff(px))
    assert np.array_equal(via_png, via_tiff)


@settings(max_examples=15, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_tiff_roundtrip_property(h, w, seed):
    px = _rand((h, w, 3), seed)
    endian = "II" if seed % 2 == 0 else "MM"
    assert np.array_equal(decode_tiff(encode_tiff(px, endian)), px)
