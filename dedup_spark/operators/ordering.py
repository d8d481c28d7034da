"""Deterministic global shuffle index — reproducible training order.

A training run over a 100 TB corpus needs a shuffled example order
that is (a) statistically uniform, (b) bit-reproducible across reruns
and cluster sizes (so a resumed run sees the same order), and (c)
computable without a global sort bottleneck. The standard recipe is a
keyed shuffle: order by ``md5(seed || id)`` — uniform because md5 is,
reproducible because the seed is pinned, and seekable (example k's
position is a pure function of the corpus + seed).

Assigning the dense 0-based POSITION of each row in that order is the
part that doesn't scale naively: ``row_number() OVER (ORDER BY key)``
collapses the whole dataset into ONE partition (Spark warns exactly
this). This operator does the classic two-pass distributed ranking
instead:

  1. bucket each row by its key prefix (256 uniform buckets — md5's
     first byte), count rows per bucket (one combinable aggregation,
     256-row result to the driver),
  2. prefix-sum the counts into per-bucket offsets (256 adds on the
     driver — O(buckets), not O(rows)) and broadcast them back,
  3. rank WITHIN each bucket (a window partitioned by bucket — 256-way
     parallel, each window sorts ~n/256 rows) and add the offset.

Total cost: one narrow pass + one 256-group aggregate + one
partitioned window sort — no single-partition stage anywhere. Bucket
skew is bounded by md5 uniformity (±0.5% at a million rows per
bucket); raise ``bucket_bytes`` to 2 for 65 536 buckets when n/256
exceeds a comfortable window-sort size.

Ties inside a bucket are broken by the id itself, so the produced
order is total and deterministic even if two ids ever collided on
their full md5 (they can't within 2^-64, but determinism shouldn't
ride on a probabilistic argument when one extra sort key is free).

Reference analog: none — the reference is a dedup CLI; ordering is
part of this engine's training-pipeline surface (SURVEY.md §2.3 EXT).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def shuffle_key(id_col: Column, seed: str) -> Column:
    """md5(seed || ':' || id) as a lowercase hex string — the
    deterministic sort key. String concat (not binary) so the DuckDB
    oracle computes the identical digest."""
    return F.md5(
        F.concat(F.lit(seed), F.lit(":"), id_col.cast("string")).cast("binary")
    )


def _bucketed_scan(
    df: DataFrame,
    id_col: str,
    seed: str,
    bucket_bytes: int,
    value: Column,
    out_col: str,
) -> DataFrame:
    """Shared two-pass engine: EXCLUSIVE running total of ``value``
    over the seeded md5 order, written to ``out_col``. Pass value=1
    and you get the dense 0-based rank (prefix COUNT); pass a token
    count and you get the prefix SUM a concat-and-chunk packer needs.

    Pass 1 aggregates ``value`` per key-prefix bucket (combinable, one
    tiny collect); the driver prefix-sums n_buckets numbers; pass 2
    broadcast-joins the offsets back and runs the per-bucket window —
    n_buckets parallel sorts, never a global-order window."""
    n_buckets = 1 << (8 * bucket_bytes)
    keyed = (
        df.withColumn("shuffle_key", shuffle_key(F.col(id_col), seed))
        .withColumn("_val", value.cast("long"))
        .withColumn(
            "_bkt",
            F.conv(F.substring("shuffle_key", 1, 2 * bucket_bytes), 16, 10).cast(
                "int"
            ),
        )
    )
    totals = {
        r["_bkt"]: r["s"]
        for r in keyed.groupBy("_bkt").agg(F.sum("_val").alias("s")).collect()
    }
    offsets, acc = [], 0
    for b in range(n_buckets):
        offsets.append((b, acc))
        acc += totals.get(b, 0)
    # broadcast-join the offsets back (n_buckets rows — tiny at any
    # bucket width, unlike an n_buckets-element array literal)
    off = F.broadcast(
        df.sparkSession.createDataFrame(offsets, schema="_bkt int, _off long")
    )
    w = (
        Window.partitionBy("_bkt")
        .orderBy("shuffle_key", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        keyed.join(off, on="_bkt", how="inner")
        .withColumn(
            out_col,
            (F.sum("_val").over(w) - F.col("_val") + F.col("_off")).cast("long"),
        )
        .drop("_bkt", "_off", "_val")
    )


def global_shuffle_index(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "seed-0",
    bucket_bytes: int = 1,
) -> DataFrame:
    """Add ``shuffle_key`` (hex md5) and ``shuffle_pos`` (dense 0-based
    BIGINT position in the seeded order) to ``df`` — two-pass bucketed
    ranking, no single-partition window. One driver action (the
    256-row bucket-count collect) per call."""
    return _bucketed_scan(
        df, id_col, seed, bucket_bytes, F.lit(1), "shuffle_pos"
    )


def global_running_total(
    df: DataFrame,
    value_col: str,
    id_col: str = "doc_id",
    seed: str = "seed-0",
    bucket_bytes: int = 1,
    out_col: str = "running_total",
) -> DataFrame:
    """EXCLUSIVE prefix sum of ``value_col`` over the seeded shuffle
    order (row i gets the sum of all values strictly before it). The
    building block for concat-and-chunk sequence packing: a document
    whose predecessors total T tokens starts at global token offset T,
    regardless of how many executors computed the prefix."""
    return _bucketed_scan(
        df, id_col, seed, bucket_bytes, F.col(value_col), out_col
    )
