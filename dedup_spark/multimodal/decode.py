"""Image decode / feature-extract over binary columns.

Images, audio, and video are opaque `binary` columns with typed metadata
(w, h, fmt). All pixel work happens in Arrow-batched pandas UDFs via
mapInPandas — the Spark-side plumbing (schema, batch shape, partition
sizing) is real and tested. TWO formats decode for real with zero
imaging libs: PPM (pure numpy) and PNG (stdlib zlib + numpy unfilter,
multimodal/png.py — 8-bit grey/RGB/RGBA, all five filters). Remaining
codec-heavy decodes (jpeg/webp) sit behind a PIL import-try since
those libs are not in this container.

Batch-shape contract: mapInPandas receives an iterator of pandas
DataFrames whose size is bounded by spark.sql.execution.arrow.
maxRecordsPerBatch — for image payloads set maxPartitionBytes low
enough (session.py: 128m) that a batch of decoded pixels fits executor
Python memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from dedup_spark.fixtures.images import decode_ppm, phash64

try:  # codec libs are optional; PPM path never needs them
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def _decode_any(data: bytes, fmt: str) -> np.ndarray | None:
    """Decode one payload; None on failure (unreadable-row skip semantics,
    reference src/hasher.rs:57-60)."""
    if data is None:
        return None
    try:
        if fmt == "ppm":
            return decode_ppm(bytes(data))
        if fmt == "png":
            from dedup_spark.multimodal.png import decode_png

            return decode_png(bytes(data))
        if _HAS_PIL:
            import io

            from PIL import Image

            return np.asarray(Image.open(io.BytesIO(bytes(data))).convert("RGB"))
        raise NotImplementedError(
            f"decode for fmt={fmt!r} requires an imaging lib not present in "
            "this container — plumbing is real, codec is stubbed"
        )
    except (ValueError, OSError):
        return None


def _mean_pool(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic nearest-grid mean-pool resize (pure numpy)."""
    h, w, _ = px.shape
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return px[np.ix_(ys, xs)]


FEATURE_SCHEMA = (
    "image_id string, ok boolean, mean_r double, mean_g double, "
    "mean_b double, std_gray double, recomputed_phash long"
)


def extract_image_features(
    df: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
) -> DataFrame:
    """Decode → per-channel means, gray std, recomputed phash.

    Undecodable rows yield ok=false with null features (job survives —
    the 10^12-scale invariant). Input is projected to only the needed
    columns BEFORE the Python stage so Arrow ships no extra bytes.
    """

    def _extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, data, fmt in zip(pdf[id_col], pdf[bytes_col], pdf[fmt_col]):
                px = _decode_any(data, fmt)
                if px is None:
                    rows.append((rid, False, None, None, None, None, None))
                    continue
                means = px.reshape(-1, 3).mean(axis=0)
                gray = px.astype(np.float64).mean(axis=2)
                rows.append(
                    (
                        rid,
                        True,
                        float(means[0]),
                        float(means[1]),
                        float(means[2]),
                        float(gray.std()),
                        int(phash64(px)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col,
                    "ok",
                    "mean_r",
                    "mean_g",
                    "mean_b",
                    "std_gray",
                    "recomputed_phash",
                ],
            )

    return df.select(id_col, bytes_col, fmt_col).mapInPandas(
        _extract, schema=FEATURE_SCHEMA
    )


def resize_images(
    df: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
) -> DataFrame:
    """Re-encode every decodable image at (out_w, out_h); schema
    (image_id, bytes, w, h, fmt). Undecodable rows are dropped."""
    from dedup_spark.fixtures.images import encode_ppm

    def _resize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, data, fmt in zip(pdf[id_col], pdf[bytes_col], pdf[fmt_col]):
                px = _decode_any(data, fmt)
                if px is None:
                    continue
                rows.append(
                    (rid, encode_ppm(_mean_pool(px, out_w, out_h)), out_w, out_h, "ppm")
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "bytes", "w", "h", "fmt"]
            )

    return df.select(id_col, bytes_col, fmt_col).mapInPandas(
        _resize, schema="image_id string, bytes binary, w int, h int, fmt string"
    )


def frame_sample_stub(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling — STUB. Video codecs are absent from the
    container; the real operator would mapInPandas over (video_id, bytes)
    and emit (video_id, frame_idx, frame_bytes). Raises on use."""
    raise NotImplementedError(
        "video frame sampling requires a codec lib not present in this "
        "container; see module docstring for the intended plumbing"
    )
