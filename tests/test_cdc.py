"""Content-defined chunking (operators/cdc.py): boundary rule, chunk
reconstruction, shift-resync (the property fixed-size blocks lack),
and the dedup report."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dedup_spark.operators.cdc import cdc_dedup_stats, chunk_records

DIV = 64


def _blob(seed: bytes, n: int) -> bytes:
    out = b""
    ctr = 0
    while len(out) < n:
        out += hashlib.sha256(seed + ctr.to_bytes(4, "big")).digest()
        ctr += 1
    return out[:n]


def _spark_chunks(spark, blobs: dict[str, bytes]):
    df = spark.createDataFrame(
        pd.DataFrame(
            {"video_id": list(blobs), "bytes": list(blobs.values())}
        )
    )
    out = {}
    for r in chunk_records(df, divisor=DIV).collect():
        out.setdefault(r.video_id, []).append(
            (r.chunk_idx, r.chunk_len, r.chunk_md5)
        )
    return {k: sorted(v) for k, v in out.items()}


def _ref_chunks(b: bytes) -> list[tuple[int, int, str]]:
    """Independent scalar reference of the boundary rule."""
    ends = [
        i
        for i in range(2, len(b) + 1)
        if (b[i - 2] * 256 + b[i - 1]) % DIV == 0
    ]
    if not ends or ends[-1] != len(b):
        ends.append(len(b))
    hx = b.hex().upper()
    out, s = [], 0
    for ci, e in enumerate(ends):
        out.append(
            (ci, e - s, hashlib.md5(hx[2 * s : 2 * e].encode()).hexdigest())
        )
        s = e
    return out


def test_chunks_match_scalar_reference(spark):
    blobs = {f"b{i}": _blob(b"cdc:%d" % i, 700 + 13 * i) for i in range(4)}
    got = _spark_chunks(spark, blobs)
    for k, b in blobs.items():
        assert got[k] == _ref_chunks(b)
        assert sum(c[1] for c in got[k]) == len(b)  # lossless cover


def test_boundary_on_last_byte_no_empty_chunk(spark):
    # craft a blob whose final pair hits the rule: ...0x01 0x40 -> 0x0140
    # = 320, 320 % 64 == 0 -> boundary exactly at n, no trailing chunk
    body = bytes(x | 1 for x in _blob(b"odd", 100))  # odd bytes: no hit
    blob = body + b"\x01\x40"
    ref = _ref_chunks(blob)
    assert ref[-1][1] > 0
    got = _spark_chunks(spark, {"x": blob})["x"]
    assert got == ref


def test_shift_resync_vs_fixed_blocks(spark):
    """Prepending 5 bytes: every fixed 64-byte block differs, but the
    CDC chunk stream resyncs — at most the first chunk of the original
    is missing from the variant."""
    base = _blob(b"resync", 4096)
    var = b"\xde\xad\xbe\xef\x01" + base
    got = _spark_chunks(spark, {"base": base, "var": var})
    h_base = {c[2] for c in got["base"]}
    h_var = {c[2] for c in got["var"]}
    missing = h_base - h_var
    assert len(missing) <= 1  # only the head chunk can differ
    assert len(h_base & h_var) >= len(h_base) - 1
    # fixed-size blocks: zero shared under the same shift
    fixed_base = {base[i : i + 64] for i in range(0, len(base), 64)}
    fixed_var = {var[i : i + 64] for i in range(0, len(var), 64)}
    assert not fixed_base & fixed_var


def test_dedup_stats_report(spark):
    a = _blob(b"A", 2000)
    blobs = {
        "a": a,
        "a_pre": b"\x07\x07" + a,  # resynced twin
        "solo": _blob(b"B", 2000),  # unrelated
    }
    df = spark.createDataFrame(
        pd.DataFrame(
            {"video_id": list(blobs), "bytes": list(blobs.values())}
        )
    )
    rows = {
        r.video_id: r for r in cdc_dedup_stats(df, divisor=DIV).collect()
    }
    assert rows["a"].n_bytes == 2000
    assert rows["a"].shared_fraction >= 0.9  # shares ~everything with twin
    assert rows["a_pre"].shared_fraction >= 0.9
    assert rows["solo"].n_shared_chunks == 0
    assert rows["solo"].shared_fraction == 0.0
