"""Rotation/flip-invariant image dedup — rotated re-posts WITHOUT EXIF:
the orientation tier (multimodal/exif.py) normalizes rotations only
when the camera recorded an orientation tag; a stripped-metadata
rotated copy (the normal case on the open web — most CDNs strip EXIF)
defeats byte dedup, pixel-sha, thumbprint, dHash AND content-box
signatures, because every one of them depends on pixel POSITIONS.

The signature here depends on pixel VALUES only: the multiset of RGB
triples. All eight dihedral transforms (4 rotations × mirror) PERMUTE
pixels without changing a single value, so the multiset — serialized
canonically as the sorted unique (r,g,b,count) table and sha256'd —
is bitwise-invariant under them BY CONSTRUCTION. Like pHash banding,
this is a CANDIDATE tier, not a verdict: two different images can in
principle share a color multiset, so production pipelines verify
candidates (decode both, try the 8 transforms); the fixture generator
asserts cross-source multiset distinctness so the gate's
group-by-source oracle is exact.

Scale shape: one Arrow projection consuming the payload → groupBy on
a 64-char key → join-back (the thumbprint/dhash/content-box plan)."""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F


def multiset_signature(px: np.ndarray) -> str:
    """sha256 over the canonical (r,g,b,count) table — invariant under
    any pixel permutation, in particular the 8 dihedral transforms."""
    import hashlib

    flat = px.reshape(-1, 3)
    vals, counts = np.unique(flat, axis=0, return_counts=True)
    h = hashlib.sha256()
    h.update(np.int64(flat.shape[0]).tobytes())
    h.update(np.ascontiguousarray(vals).tobytes())
    h.update(counts.astype(np.int64).tobytes())
    return h.hexdigest()


def rotation_invariant_clusters(
    df: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
) -> DataFrame:
    """(id, ok, cluster_id): cluster by pixel-multiset signature;
    cluster_id = min id per signature; undecodable rows survive as
    ok=false singletons."""
    from dedup_spark.multimodal.decode import _decode_any

    def _sig(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, data, fmt in zip(
                pdf[id_col], pdf[bytes_col], pdf[fmt_col]
            ):
                px = _decode_any(data, fmt)
                if px is None:
                    rows.append((rid, False, None))
                    continue
                rows.append((rid, True, multiset_signature(px)))
            yield pd.DataFrame(rows, columns=[id_col, "ok", "ms_sha"])

    sig = df.select(id_col, bytes_col, fmt_col).mapInPandas(
        _sig, schema=f"{id_col} string, ok boolean, ms_sha string"
    ).localCheckpoint(eager=False)
    roots = (
        sig.filter(F.col("ok"))
        .groupBy("ms_sha")
        .agg(F.min(id_col).alias("cluster_id"))
    )
    return sig.join(roots, on="ms_sha", how="left").select(
        id_col,
        "ok",
        F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
    )
