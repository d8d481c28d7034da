"""Salted aggregation — explicit skew handling (north rule).

Where skew actually lives in this engine, and what kills it:

  * count / min / sum group-bys (the cascade, band-bucket stats):
    partial aggregation (map-side combine) already reduces a
    billion-row hot key to one row per task BEFORE the shuffle — no
    salting needed; Spark's HashAggregate does it automatically.
  * LSH / Hamming band self-joins (duplicate floods): the star guard
    (minhash.py / simhash.py `max_band_bucket`) caps fan-out at O(n)
    per bucket — salting can't fix an O(n²) pair explosion, changing
    the algorithm can.
  * joins against skewed keys: AQE skew-join splitting
    (session.py `spark.sql.adaptive.skewJoin.enabled`).

What's LEFT for salting is the one shape none of the above covers:
**non-combinable aggregations** over skewed keys — collect_list /
collect_set / exact percentile — where every row of a hot key must
reach one reducer. `salted_agg` runs them in two phases: phase 1
groups on (key, salt) so a hot key spreads over `salt_buckets`
reducers, phase 2 merges the per-salt partials (tiny: one row per
(key, salt)).

The reference's analog is nested rayon work-stealing inside a big size
group (src/main.rs:188-205): inner parallelism for one large group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from dedup_spark.config import DEFAULT_CONFIG, DedupConfig


def with_salt(
    df: DataFrame,
    buckets: int,
    col_name: str = "_salt",
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Deterministic salt column in [0, buckets): pmod(xxhash64(cols)).

    Deterministic (unlike rand()) so a task retry after a partial
    shuffle fetch recomputes the SAME row→bucket assignment — a
    non-deterministic salt can double-count rows in phase 1 when a
    retried map task re-emits rows into different buckets than the
    partially-fetched attempt did. xxhash64 over ``salt_on`` (default:
    all columns) gives the same uniform spread. Caveat: fully identical
    rows land in the same bucket; the salted aggregations here are
    set-semantics (collect_set) or combinable (count), where identical
    rows carry no extra reducer work, so the spread still holds where
    it matters — pass a row-unique id in ``salt_on`` when one exists.
    """
    cols = salt_on if salt_on is not None else df.columns
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets)).cast("int")
    )


def salted_collect_set(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    cfg: DedupConfig = DEFAULT_CONFIG,
    sort_result: bool = True,
) -> DataFrame:
    """collect_set(value) BY keys, skew-safe.

    Phase 1: groupBy(keys + salt) → per-salt member arrays (a hot key's
    rows split across cfg.salt_buckets reducers).
    Phase 2: groupBy(keys) over ONE ROW PER SALT → flatten + dedup.
    The phase-2 input is bounded by buckets × |keys|, so its reducer is
    never hot regardless of input skew.
    """
    salted = with_salt(df, cfg.salt_buckets)
    phase1 = salted.groupBy(*keys, "_salt").agg(
        F.collect_set(value_col).alias("_part")
    )
    merged = phase1.groupBy(*keys).agg(
        F.array_distinct(F.flatten(F.collect_list("_part"))).alias("members")
    )
    if sort_result:
        merged = merged.withColumn("members", F.sort_array("members"))
    return merged


def salted_count(
    df: DataFrame,
    keys: list[str],
    cfg: DedupConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """count(*) BY keys via explicit two-phase salt. Semantically
    identical to a plain groupBy().count() — which Spark already
    partial-aggregates — provided for symmetry and for engines/configs
    where partial aggregation is disabled (e.g. high-cardinality
    aggregate buffers spilling)."""
    salted = with_salt(df, cfg.salt_buckets)
    phase1 = salted.groupBy(*keys, "_salt").agg(F.count(F.lit(1)).alias("_n"))
    return phase1.groupBy(*keys).agg(F.sum("_n").cast("long").alias("n"))
