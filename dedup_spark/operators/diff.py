"""Row-level snapshot diff — the reconciliation report between two
versions of an ingest table (yesterday's crawl vs today's): which rows
were added, removed, re-captioned, re-encoded, or untouched. The
cluster-level view of churn is crawl_churn_report; this is the
row-level CDC view an incremental pipeline uses to decide which rows
re-enter which tiers (changed bytes → re-decode + re-hash; changed
caption → re-shingle only; unchanged → skip everything).

Plan shape: both sides are projected to (id, sha256(payload),
caption) — the payload never crosses the full-outer-join Exchange,
only its 64-hex sha does — then ONE full outer join on the id and a
CASE over null-ness and hash equality. At 100 TB this is one
co-partitioned join of two key tables; with both tables bucketed by
id it is shuffle-free.

Reference analog: the reference re-walks the whole tree every run
(src/scanner.rs); the diff is what lets a 10^12-row corpus NOT do
that."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    caption_col: str = "caption",
) -> DataFrame:
    """(id, status) with status in added | removed | changed_bytes |
    changed_caption | changed_both | unchanged."""

    def key(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(f"{tag}_id"),
            F.sha2(F.col(bytes_col), 256).alias(f"{tag}_sha"),
            F.col(caption_col).alias(f"{tag}_cap"),
        )

    o, n = key(old, "o"), key(new, "n")
    j = o.join(n, o["o_id"] == n["n_id"], "full_outer")
    bytes_eq = F.col("o_sha").eqNullSafe(F.col("n_sha"))
    cap_eq = F.col("o_cap").eqNullSafe(F.col("n_cap"))
    return j.select(
        F.coalesce(F.col("o_id"), F.col("n_id")).alias(id_col),
        F.when(F.col("o_id").isNull(), "added")
        .when(F.col("n_id").isNull(), "removed")
        .when(~bytes_eq & ~cap_eq, "changed_both")
        .when(~bytes_eq, "changed_bytes")
        .when(~cap_eq, "changed_caption")
        .otherwise("unchanged")
        .alias("status"),
    )
