"""Sorted-neighborhood method (SNM) — windowed candidate generation.

The public recipe (Hernandez & Stolfo 1995 "The Merge/Purge Problem";
the standard textbook alternative to LSH blocking in record linkage):
sort all records by a domain-chosen key, slide a fixed window of size
w down the sorted order, and emit every pair inside a window as a
candidate for the expensive verifier. Where deletion-neighborhood
blocking (`editdist.py`) finds pairs that share a typo-radius key, SNM
finds pairs the SORT puts close — e.g. records differing in a suffix,
or any similarity correlated with the sort key — and its candidate
count is exactly n·(w-1) minus edge effects, INDEPENDENT of key-bucket
skew (the flood that blows up an LSH band costs SNM nothing).

The distributed obstacle is the global sort ORDER, not the sort:
`row_number() OVER (ORDER BY key)` collapses to one partition. This
module reuses the engine's two-pass range-partitioned rank
(`suffixarray.dense_ranks`: range-partition, count per partition,
driver prefix-sum over n_parts numbers, broadcast offsets, per-
partition row_number) and then turns the sliding window into a JOIN:

  * each ranked record enters TWO overlap bands, floor(rank/w) and
    floor(rank/w)+1;
  * a self-equi-join on the band key + the filter 0 < gap < w yields
    exactly the window pairs (any pair with gap < w shares >= 1 band
    — floor((r+g)/w) <= floor(r/w)+1 for g < w), deduplicated because
    a pair can share both bands;
  * band populations are FIXED at 2w records, so the join is
    perfectly balanced by construction — no skew machinery needed.

Reference parity: [EXT] LLM-pipeline surface (SURVEY.md §2.4); no
reference counterpart. The oracle recomputes the rank with a plain
row_number window and the window pairs with a range join — two
different algorithms, identical pair sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dedup_spark.operators.suffixarray import dense_ranks


def snm_candidate_pairs(
    df: DataFrame,
    *,
    key_col: str,
    id_col: str,
    window: int,
    n_parts: int = 32,
) -> DataFrame:
    """All unordered record pairs within `window` positions of each
    other in the (key_col, id_col) sort order. Returns
    (key_a, key_b, id_a, id_b, gap) with rank_a < rank_b,
    gap = rank_b - rank_a in [1, window-1].
    """
    if window < 2:
        raise ValueError("window must be >= 2")
    ranked = dense_ranks(
        df.select(key_col, id_col), [key_col, id_col], "rank", n_parts
    )
    band = F.floor(F.col("rank") / window)
    banded = ranked.select(
        F.col(key_col).alias("_key"),
        F.col(id_col).alias("_id"),
        "rank",
        F.explode(F.array(band, band + 1)).alias("_band"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, F.col("a._band") == F.col("b._band"))
        .filter(
            (F.col("b.rank") > F.col("a.rank"))
            & (F.col("b.rank") - F.col("a.rank") < window)
        )
        .select(
            F.col("a._key").alias(f"{key_col}_a"),
            F.col("b._key").alias(f"{key_col}_b"),
            F.col("a._id").alias(f"{id_col}_a"),
            F.col("b._id").alias(f"{id_col}_b"),
            (F.col("b.rank") - F.col("a.rank")).cast("long").alias("gap"),
        )
        .distinct()
    )
