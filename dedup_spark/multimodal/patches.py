"""Shared-patch mining — partial-content duplication BETWEEN images:
the same logo, watermark, frame element or sprite pasted into many
otherwise-different pictures. Whole-image tiers (byte/pixel sha,
thumbprint, content-box, dHash/pHash) all treat such images as
unrelated; patch mining finds the common sub-block, which is how
image pipelines surface watermark families and template spam.

Mechanics: decode → cut the image into non-overlapping ``patch``²
aligned blocks → sha256 each block → drop ZERO-VARIANCE blocks (a
flat white/black patch appears in half the corpus and carries no
identity — the stopword of image space) → inverted-index join on
patch sha with a POSTING CAP (dropped-key counts logged, no silent
caps — the suffix tier's discipline: a patch shared by thousands of
images is a template, not a link worth quadratic pairs) → per-pair
shared-patch counts.

Alignment contract: signatures match only when the shared block lands
on the same ``patch``-grid phase in both images. Detecting arbitrary
offsets needs dense stride (stride < patch) at stride² the rows —
the fixture pins the limitation with a deliberately misaligned class
instead of pretending otherwise.

Scale shape: one Arrow mapInPandas projection (payload consumed
there), a (sha, id) shuffle, count-capped self-join, count aggregate
— the exact shape of the caption shingle tier (suffix.py)."""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F


def patch_signatures(
    df: DataFrame,
    patch: int = 8,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
) -> DataFrame:
    """(id, py, px, patch_sha) for every aligned non-overlapping
    patch×patch block with non-zero variance. Undecodable rows and
    images smaller than one patch yield no rows."""
    import hashlib

    from dedup_spark.multimodal.decode import _decode_any

    def _cut(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, data, fmt in zip(
                pdf[id_col], pdf[bytes_col], pdf[fmt_col]
            ):
                px = _decode_any(data, fmt)
                if px is None:
                    continue
                h, w, _ = px.shape
                for y in range(0, h - patch + 1, patch):
                    for x in range(0, w - patch + 1, patch):
                        blk = px[y : y + patch, x : x + patch]
                        if blk.max() == blk.min():
                            continue  # flat: the stopword of images
                        rows.append(
                            (
                                rid,
                                y,
                                x,
                                hashlib.sha256(
                                    np.ascontiguousarray(blk).tobytes()
                                ).hexdigest(),
                            )
                        )
            yield pd.DataFrame(
                rows, columns=[id_col, "py", "px", "patch_sha"]
            )

    return df.select(id_col, bytes_col, fmt_col).mapInPandas(
        _cut, schema=f"{id_col} string, py int, px int, patch_sha string"
    )


def shared_patch_pairs(
    df: DataFrame,
    patch: int = 8,
    max_posting: int = 256,
    id_col: str = "image_id",
    log_drops: bool = True,
) -> DataFrame:
    """(id1, id2, n_shared) for image pairs sharing >= 1 non-flat
    aligned patch; n_shared counts DISTINCT shared patch signatures.
    Patch signatures carried by more than ``max_posting`` images are
    dropped (template guard) with the drop count logged."""
    # lineage cut: the plan references sig 3-4 times (counts, keep,
    # both self-join sides) — without it the Arrow decode+sha pass
    # over every image re-executes per reference (the thumbprint/
    # dhash/rotinv tiers guard the same way)
    sig = patch_signatures(df, patch=patch, id_col=id_col).select(
        id_col, "patch_sha"
    ).distinct().localCheckpoint(eager=False)
    counts = sig.groupBy("patch_sha").agg(
        F.count(F.lit(1)).alias("_n")
    )
    if log_drops:
        n_drop = counts.filter(F.col("_n") > max_posting).count()
        if n_drop:
            print(
                f"shared_patch_pairs: dropped {n_drop} template "
                f"patches carried by > {max_posting} images"
            )
    keep = counts.filter(
        (F.col("_n") >= 2) & (F.col("_n") <= max_posting)
    ).select("patch_sha")
    s = sig.join(keep, "patch_sha")
    a = s.select(F.col("patch_sha"), F.col(id_col).alias("id1"))
    b = s.select(F.col("patch_sha"), F.col(id_col).alias("id2"))
    return (
        a.join(b, "patch_sha")
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .select("id1", "id2", F.col("n_shared").cast("long").alias("n_shared"))
    )
