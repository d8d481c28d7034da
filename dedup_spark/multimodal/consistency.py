"""Caption↔image consistency audit — the cross-modal label-noise scan
an image+caption corpus runs before caption-supervised training:

  * an image carrying MULTIPLE different captions (re-captioned
    reposts) is label noise — which caption do you trust?
  * a caption pasted on MANY different images ('stock photo', SEO
    boilerplate) is near-worthless supervision.

Both are pure content-identity questions, so the whole audit is two
small-key aggregations over a projected scan:

  keyed   = project(id, sha256(bytes) AS img_key, caption)
  per_img = keyed GROUP BY img_key   → count(DISTINCT caption)
  per_cap = keyed GROUP BY caption   → count(DISTINCT img_key)
  out     = keyed ⋈ per_img ⋈ per_cap → status per row

The payload leaves the scan only as its 64-hex sha — no Exchange ever
carries image bytes (the engine's invariant); each count(DISTINCT x)
is a single-column distinct aggregate (partial-aggregated, no Expand).
At 100 TB this is two shuffles of (hash, caption) keys and two joins
back — the same shape as the exact tier's cascade.

Reference analog: the hash-grouping stage (src/grouping.rs) answers
'same bytes?'; this generalizes it to 'same bytes, different labels?'
across the two modalities the north-rule table carries."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def caption_image_consistency(
    df: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    caption_col: str = "caption",
) -> DataFrame:
    """Per row: (id, n_captions, n_images, status) where n_captions is
    the distinct-caption count of this row's image content and
    n_images the distinct-image count of this row's caption. status:
    'both' | 'caption_conflict' | 'stock_caption' | 'consistent',
    or 'incomplete' for rows missing the payload or the caption —
    the report is TOTAL (every input row appears exactly once; an
    audit that silently drops rows hides exactly what it exists to
    surface). Note a 'both' GROUP yields different row-level statuses
    on its different sides — status is a per-row fact, not a cluster
    fact."""
    ok = F.col(bytes_col).isNotNull() & F.col(caption_col).isNotNull()
    incomplete = df.filter(~ok).select(
        id_col,
        F.lit(0).cast("long").alias("n_captions"),
        F.lit(0).cast("long").alias("n_images"),
        F.lit("incomplete").alias("status"),
    )
    keyed = df.filter(ok).select(
        id_col,
        F.sha2(F.col(bytes_col), 256).alias("_img_key"),
        F.col(caption_col).alias("_cap"),
    )
    per_img = keyed.groupBy("_img_key").agg(
        F.count_distinct("_cap").alias("n_captions")
    )
    per_cap = keyed.groupBy("_cap").agg(
        F.count_distinct("_img_key").alias("n_images")
    )
    return (
        keyed.join(per_img, "_img_key")
        .join(per_cap, "_cap")
        .select(
            id_col,
            F.col("n_captions").cast("long").alias("n_captions"),
            F.col("n_images").cast("long").alias("n_images"),
            F.when(
                (F.col("n_captions") > 1) & (F.col("n_images") > 1),
                "both",
            )
            .when(F.col("n_captions") > 1, "caption_conflict")
            .when(F.col("n_images") > 1, "stock_caption")
            .otherwise("consistent")
            .alias("status"),
        )
        .unionByName(incomplete)
    )
