"""EXIF/TIFF metadata: standards-shaped writer + GENERAL parser.

Public spec: EXIF is a TIFF 6.0 container inside a JPEG APP1 segment
("Exif\\0\\0" + TIFF header + IFD chain; CIPA DC-008 / TIFF 6.0). The
pipeline value: camera metadata (orientation, dimensions, timestamps,
make/model) extracted at SCAN SPEED without decoding a single pixel —
at 100 TB the metadata pass is a projection, the decode pass is the
expensive tier you gate behind it.

Same architecture as the MJPEG-in-AVI tier (multimodal/avi.py): the
WRITER is fixed-layout (every ASCII field fixed-width, tags sorted, so
each field's absolute byte offset in the file is a constant the writer
asserts — the oracle slices hex at those offsets and re-decodes every
value, both endians); the PARSER is general (walks JPEG segments to
any APP1, honors the TIFF endian flag, walks IFD entries of any order,
inline vs offset values, unknown tags skipped) — so the gate proves
the general walker against independently recomputed bytes.

Both byte orders are exercised: even image indices write
little-endian ("II") TIFF, odd write big-endian ("MM").
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# IFD0 tags (TIFF 6.0 / EXIF): fixed writer layout, sorted by tag id
TAG_WIDTH = 0x0100  # LONG
TAG_HEIGHT = 0x0101  # LONG
TAG_MAKE = 0x010F  # ASCII, fixed 11 bytes incl NUL ("maker-%04d")
TAG_MODEL = 0x0110  # ASCII, fixed 11 bytes incl NUL ("model-%04d")
TAG_ORIENTATION = 0x0112  # SHORT
TAG_DATETIME = 0x0132  # ASCII, fixed 20 bytes incl NUL

MAKE_LEN = 11
MODEL_LEN = 11
DT_LEN = 20
N_ENTRIES = 6
# TIFF-relative layout (writer-asserted): header 8 B, count 2 B,
# 6 entries x 12 B, next-IFD 4 B -> value area at offset 86
_VAL0 = 8 + 2 + N_ENTRIES * 12 + 4
OFF_MAKE = _VAL0
OFF_MODEL = _VAL0 + MAKE_LEN
OFF_DT = _VAL0 + MAKE_LEN + MODEL_LEN
TIFF_LEN = _VAL0 + MAKE_LEN + MODEL_LEN + DT_LEN
# APP1 = FF E1 <len:2> "Exif\0\0" <tiff>; inserted right after SOI, so
# the TIFF block starts at absolute file offset 12
APP1_HDR = 10  # 2 marker + 2 length + 6 signature
TIFF_ABS = 2 + APP1_HDR


def build_exif_app1(
    make: str,
    model: str,
    orientation: int,
    width: int,
    height: int,
    datetime: str,
    big_endian: bool = False,
) -> bytes:
    """Fixed-layout EXIF APP1 segment. ASCII fields must be exactly
    their fixed width minus the NUL; offsets are asserted so the
    oracle's hex-slice positions are guaranteed."""
    e = ">" if big_endian else "<"
    assert len(make) == MAKE_LEN - 1 and len(model) == MODEL_LEN - 1
    assert len(datetime) == DT_LEN - 1

    def entry(tag: int, typ: int, count: int, value: bytes) -> bytes:
        assert len(value) <= 4
        return struct.pack(e + "HHI", tag, typ, count) + value.ljust(4, b"\0")

    hdr = (b"MM" if big_endian else b"II") + struct.pack(e + "HI", 42, 8)
    entries = [
        entry(TAG_WIDTH, 4, 1, struct.pack(e + "I", width)),
        entry(TAG_HEIGHT, 4, 1, struct.pack(e + "I", height)),
        entry(TAG_MAKE, 2, MAKE_LEN, struct.pack(e + "I", OFF_MAKE)),
        entry(TAG_MODEL, 2, MODEL_LEN, struct.pack(e + "I", OFF_MODEL)),
        entry(TAG_ORIENTATION, 3, 1, struct.pack(e + "H", orientation) + b"\0\0"),
        entry(TAG_DATETIME, 2, DT_LEN, struct.pack(e + "I", OFF_DT)),
    ]
    ifd = struct.pack(e + "H", N_ENTRIES) + b"".join(entries) + struct.pack(
        e + "I", 0
    )
    vals = (
        make.encode() + b"\0" + model.encode() + b"\0" + datetime.encode() + b"\0"
    )
    tiff = hdr + ifd + vals
    assert len(tiff) == TIFF_LEN
    assert tiff.index(make.encode()) == OFF_MAKE
    payload = b"Exif\0\0" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def insert_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Insert an APP1 segment right after SOI (the standard position)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    return jpeg[:2] + app1 + jpeg[2:]


_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4}


def parse_exif(jpeg: bytes) -> dict | None:
    """GENERAL parser: JPEG segment walk → first Exif APP1 → TIFF IFD0
    walk (either endian, entries in any order, inline or offset
    values, unknown tags skipped). Returns {tag_id: value} or None if
    no Exif APP1 exists. Malformed structures raise ValueError —
    including truncated buffers, which struct/indexing would otherwise
    surface as struct.error/IndexError and escape callers' except
    clauses (the 10^12-row survive-corruption invariant)."""
    try:
        return _parse_exif_inner(jpeg)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"malformed EXIF structure: {exc}") from exc


def _parse_exif_inner(jpeg: bytes) -> dict | None:
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    i, n = 2, len(jpeg)
    tiff = None
    while i + 4 <= n:
        if jpeg[i] != 0xFF:
            raise ValueError("marker expected")
        while i + 1 < n and jpeg[i + 1] == 0xFF:  # fill bytes (T.81 B.1.1.2)
            i += 1
        marker = jpeg[i + 1]
        if marker == 0xDA or marker == 0xD9:  # scan data / EOI: stop
            break
        seg_len = struct.unpack(">H", jpeg[i + 2 : i + 4])[0]
        seg = jpeg[i + 4 : i + 2 + seg_len]
        if marker == 0xE1 and seg[:6] == b"Exif\0\0":
            tiff = seg[6:]
            break
        i += 2 + seg_len
    if tiff is None:
        return None
    order = tiff[:2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        raise ValueError("bad TIFF byte order")
    magic, ifd_off = struct.unpack(e + "HI", tiff[2:8])
    if magic != 42:
        raise ValueError("bad TIFF magic")
    count = struct.unpack(e + "H", tiff[ifd_off : ifd_off + 2])[0]
    out: dict[int, object] = {}
    for k in range(count):
        off = ifd_off + 2 + 12 * k
        tag, typ, cnt = struct.unpack(e + "HHI", tiff[off : off + 8])
        if typ not in _TYPE_SIZE:
            continue  # unknown type: skip (general-walker contract)
        nbytes = _TYPE_SIZE[typ] * cnt
        if nbytes <= 4:
            raw = tiff[off + 8 : off + 8 + nbytes]
        else:
            voff = struct.unpack(e + "I", tiff[off + 8 : off + 12])[0]
            raw = tiff[voff : voff + nbytes]
        if typ == 2:  # ASCII, NUL-terminated
            out[tag] = raw.split(b"\0")[0].decode("ascii", "replace")
        elif typ == 3:
            vals = struct.unpack(e + f"{cnt}H", raw)
            out[tag] = vals[0] if cnt == 1 else list(vals)
        elif typ == 4:
            vals = struct.unpack(e + f"{cnt}I", raw)
            out[tag] = vals[0] if cnt == 1 else list(vals)
        else:  # BYTE
            out[tag] = raw[0] if cnt == 1 else list(raw)
    return out


def normalize_orientation(px, orientation: int):
    """Stored pixels → display pixels per TIFF 6.0 orientation 1-8
    (1 normal, 2 flip-H, 3 rot180, 4 flip-V, 5 transpose, 6 rot90 CW,
    7 transverse, 8 rot90 CCW). Pure numpy views; lossless and exactly
    invertible (see ORIENTATION_INVERSE), which is what makes
    orientation-normalized dedup bit-exact."""
    import numpy as np

    if orientation == 2:
        return px[:, ::-1]
    if orientation == 3:
        return px[::-1, ::-1]
    if orientation == 4:
        return px[::-1, :]
    if orientation == 5:
        return px.transpose(1, 0, 2)
    if orientation == 6:
        return np.rot90(px, k=-1)
    if orientation == 7:
        return px.transpose(1, 0, 2)[::-1, ::-1]
    if orientation == 8:
        return np.rot90(px, k=1)
    return px  # 1 (or out-of-spec): as stored


# o composed with ORIENTATION_INVERSE[o] is the identity:
# normalize(inverse_normalize(x, o), o) == x. 6 and 8 invert each
# other; every other orientation is an involution.
ORIENTATION_INVERSE = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 8, 7: 7, 8: 6}


EXIF_SCHEMA = (
    "image_id string, has_exif boolean, make string, model string, "
    "orientation int, exif_width long, exif_height long, taken_at string"
)


def exif_metadata(
    df: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Metadata-at-scan-speed projection: one Arrow-batched pass, no
    pixel decode. Images without an Exif APP1 (or non-JPEGs) yield
    has_exif=false with null fields — the job survives, the 10^12-row
    invariant."""

    def _parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, data in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    tags = parse_exif(bytes(data))
                except ValueError:
                    tags = None
                if not tags:
                    rows.append((rid, False, None, None, None, None, None, None))
                    continue

                def _i(v):  # multi-count tags would break the scalar schema
                    return int(v) if isinstance(v, int) else None

                def _s(v):
                    return v if isinstance(v, str) else None

                rows.append(
                    (
                        rid,
                        True,
                        _s(tags.get(TAG_MAKE)),
                        _s(tags.get(TAG_MODEL)),
                        _i(tags.get(TAG_ORIENTATION)),
                        _i(tags.get(TAG_WIDTH)),
                        _i(tags.get(TAG_HEIGHT)),
                        _s(tags.get(TAG_DATETIME)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "has_exif", "make", "model", "orientation",
                    "exif_width", "exif_height", "taken_at",
                ],
            )

    return df.select(id_col, bytes_col).mapInPandas(_parse, schema=EXIF_SCHEMA)


def orientation_normalized_clusters(
    df: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    orientation_col: str = "orientation",
) -> DataFrame:
    """Orientation-normalized pixel dedup: the same photo stored
    rotated/flipped (the 8 EXIF orientations) has different bytes,
    different dims, different phash, AND a different pixel buffer —
    nothing upstream clusters it. Normalizing to display orientation
    before hashing collapses all 8 variants into one cluster.

    The orientation arrives as a COLUMN (in a real pipeline, the
    output of ``exif_metadata`` joined back — metadata pass first,
    expensive decode pass second). Returns (id, ok, cluster_id);
    undecodable rows self-cluster with ok=false. Same scale shape as
    pixel_sha: one Arrow projection, sha-keyed groupBy, payload never
    enters an Exchange.
    """
    import hashlib

    import numpy as np
    from pyspark.sql import functions as F

    from dedup_spark.multimodal.decode import _decode_any

    def _sha(it):
        for pdf in it:
            rows = []
            for rid, data, fmt, o in zip(
                pdf[id_col], pdf[bytes_col], pdf[fmt_col],
                pdf[orientation_col],
            ):
                px = _decode_any(data, fmt)
                if px is None:
                    rows.append((rid, False, None))
                    continue
                # NULL orientation arrives as NaN once pandas widens an
                # int column with nulls to float64 — exactly what
                # exif_metadata emits for exif-less rows; treat as 1
                disp = normalize_orientation(
                    px, 1 if o is None or pd.isna(o) else int(o)
                )
                h = hashlib.sha256()
                h.update(np.int64(disp.shape[0]).tobytes())
                h.update(np.int64(disp.shape[1]).tobytes())
                h.update(np.ascontiguousarray(disp).tobytes())
                rows.append((rid, True, h.hexdigest()))
            yield pd.DataFrame(rows, columns=[id_col, "ok", "norm_sha"])

    th = df.select(id_col, bytes_col, fmt_col, orientation_col).mapInPandas(
        _sha, schema=f"{id_col} string, ok boolean, norm_sha string"
    ).localCheckpoint(eager=False)
    roots = (
        th.filter(F.col("ok"))
        .groupBy("norm_sha")
        .agg(F.min(id_col).alias("cluster_id"))
    )
    return th.join(roots, on="norm_sha", how="left").select(
        id_col, "ok",
        F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
    )
