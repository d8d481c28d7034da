"""MJPEG-in-AVI: a REAL media container for the video tier.

The rawv tier (multimodal/video.py) proved the distributed plumbing on
an invented fixture format; this module plugs the same pipeline into a
container that exists in the wild. The writer emits a standards-shaped
RIFF AVI (per the public 'AVI RIFF File Reference': RIFF('AVI ')
→ LIST hdrl (avih + LIST strl (strh 'vids'/'MJPG' + strf
BITMAPINFOHEADER)) → LIST movi ('00dc' chunks, one baseline JPEG per
frame from multimodal/jpeg.py's from-scratch encoder) → idx1), and the
reader is a general RIFF chunk WALKER — no fixed-offset assumptions,
it follows declared chunk sizes with the RIFF word-alignment rule, so
it reads any conforming MJPEG AVI, not just ours.

Oracle strategy (same independence grade as the rawv tier): fixture
AVIs pad every '00dc' payload to AVI_CHUNK bytes (legal — MJPEG
decoders stop at EOI; the zero tail is chunk padding), which pins the
movi layout to fixed strides. The DuckDB oracle therefore recomputes
every sampled frame signature straight from hex(bytes) with offset
arithmetic derived from the SAME layout constants the writer asserts
(AVI_HEADER_BYTES / AVI_CHUNK below) — zero trust in fixture metadata.
The ENGINE meanwhile parses with the general walker and must ALSO
baseline-JPEG-decode each sampled frame (a frame that fails decode is
skipped, unreadable-row semantics), so a parser or decoder regression
changes the signature sets and fails the pair compare.

Scale shape: identical to the rawv tier — parse+decode is an
embarrassingly-parallel Arrow-batched mapInPandas projection (payload
never enters an exchange), then sigs shuffle as narrow (sig, id) rows
into the shared inverted-index pair generator.

Reference parity: [EXT] multimodal surface — generalizes the
reference's group-by-content-hash cascade (src/hasher.rs) to sampled
decoded-frame content in a real-world container.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# fixture-pinned layout: the writer asserts these; the DuckDB oracle's
# offset arithmetic derives from them (see __spark_entry__.py)
AVI_HEADER_BYTES = 224  # RIFF(12)+LIST hdrl(12+64+12+64+48)+LIST movi(12)
AVI_CHUNK = 2048  # fixture '00dc' payload size (JPEG + zero padding)
AVI_TOTALFRAMES_OFF = 48  # byte offset of avih.dwTotalFrames (u32 LE)
MAX_AVI_FRAMES = 16


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    out = fourcc + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:  # RIFF chunks are word-aligned
        out += b"\x00"
    return out


def _list(fourcc: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + payload)


def encode_mjpeg_avi(
    jpeg_frames: list[bytes],
    w: int,
    h: int,
    fps: int = 25,
    pad_to: int | None = AVI_CHUNK,
) -> bytes:
    """JPEG frame payloads → one MJPEG AVI. ``pad_to`` zero-pads every
    '00dc' payload to a fixed size (fixture mode — enables the
    raw-bytes SQL oracle); None writes natural-size chunks."""
    n = len(jpeg_frames)
    if pad_to is not None:
        padded = []
        for f in jpeg_frames:
            if len(f) > pad_to:
                raise ValueError(f"frame {len(f)} B exceeds pad_to={pad_to}")
            padded.append(f + b"\x00" * (pad_to - len(f)))
        jpeg_frames = padded
    buf = max(len(f) for f in jpeg_frames) if jpeg_frames else 0
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        buf * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        buf,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII",
            0, 0, 0,  # flags, priority, language+initialframes(packed lo)
            0,  # initial frames (hi half of the packed pair above is 0)
            1, fps,  # scale, rate
            0, n,  # start, length
            buf, 0xFFFFFFFF, 0,  # bufsize, quality, samplesize
        )
        + struct.pack("<4H", 0, 0, w, h)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = b"".join(_chunk(b"00dc", f) for f in jpeg_frames)
    movi = _list(b"movi", movi_payload)
    idx_entries = []
    off = 4  # idx1 offsets count from the 'movi' fourcc
    for f in jpeg_frames:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    out = b"RIFF" + struct.pack("<I", len(body)) + body
    if pad_to == AVI_CHUNK:
        # layout contract the SQL oracle's offset arithmetic rides on
        first = out.find(b"00dc")
        assert first == AVI_HEADER_BYTES, first
        assert out[AVI_TOTALFRAMES_OFF : AVI_TOTALFRAMES_OFF + 4] == struct.pack(
            "<I", n
        )
    return out


def parse_mjpeg_avi(data: bytes) -> tuple[int, int, int, list[bytes]]:
    """General RIFF walk → (w, h, n_frames, ['00dc' payloads...]).
    Raises ValueError on a malformed container (unreadable-row skip at
    the operator level). Follows declared sizes + word alignment only —
    no fixed offsets — so it reads any conforming MJPEG AVI."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF AVI")
    end = min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    w = h = n_frames = None
    frames: list[bytes] = []

    def walk(lo: int, hi: int) -> None:
        nonlocal w, h, n_frames
        i = lo
        while i + 8 <= hi:
            fourcc = data[i : i + 4]
            size = struct.unpack("<I", data[i + 4 : i + 8])[0]
            payload_lo, payload_hi = i + 8, i + 8 + size
            if payload_hi > hi:
                raise ValueError("chunk overruns container")
            if fourcc == b"LIST":
                walk(payload_lo + 4, payload_hi)  # skip the list type tag
            elif fourcc == b"avih":
                if size < 40:
                    raise ValueError("short avih")
                n_frames = struct.unpack("<I", data[payload_lo + 16 : payload_lo + 20])[0]
                w = struct.unpack("<I", data[payload_lo + 32 : payload_lo + 36])[0]
                h = struct.unpack("<I", data[payload_lo + 36 : payload_lo + 40])[0]
            elif fourcc in (b"00dc", b"00db"):
                frames.append(data[payload_lo:payload_hi])
            i = payload_hi + (size % 2)  # word alignment

    walk(12, end)
    if w is None or n_frames is None:
        raise ValueError("no avih header")
    if len(frames) != n_frames:
        raise ValueError("frame count mismatch")
    return int(w), int(h), int(n_frames), frames


def avi_frame_signatures(
    df: DataFrame,
    every_n: int = 2,
    id_col: str = "video_id",
) -> DataFrame:
    """(video_id, frame_idx, sig) for every sampled frame of every
    readable MJPEG AVI. sig = md5 of the UPPERCASE hex of the padded
    chunk payload (hex-domain md5 so DuckDB can recompute it — same
    trick as the rawv tier). Every sampled frame must ALSO survive the
    from-scratch baseline JPEG decoder — a frame that fails to decode
    is skipped, so a decoder regression changes the signature set and
    fails the oracle compare, not just a unit test."""
    from dedup_spark.multimodal.jpeg import decode_jpeg

    def _sigs(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: list[tuple] = []
            for vid, data in zip(pdf[id_col], pdf["bytes"]):
                if data is None:
                    continue
                try:
                    _, _, n_frames, frames = parse_mjpeg_avi(bytes(data))
                except ValueError:
                    continue
                for k in range(0, n_frames, every_n):
                    try:
                        decode_jpeg(frames[k])
                    except ValueError:
                        continue
                    sig = hashlib.md5(
                        frames[k].hex().upper().encode()
                    ).hexdigest()
                    out.append((vid, k, sig))
            yield pd.DataFrame(out, columns=["video_id", "frame_idx", "sig"])

    return df.select(id_col, "bytes").mapInPandas(
        _sigs, schema="video_id string, frame_idx int, sig string"
    )
