"""Multi-granularity time-rollup cascade (hypertable-style).

The continuous-aggregate pattern from time-series stores (TimescaleDB
hypertable rollups, Druid/Pinot star-tree cubes — all public): compute
the finest grain ONCE from raw events, then derive every coarser grain
from the next-finer AGGREGATES, never re-scanning raw data. At 100 TB
of events the raw scan is the dominant cost, so hour→day→month rollups
that re-aggregate 10^4× smaller intermediates are the difference
between one pass and N passes.

Correctness rests on the aggregates being COMBINABLE (count and sum
are; avg is derived sum/count at read time — the classic decomposition)
— which is exactly what the driver oracle proves: the cascaded
coarse-grain result must equal a direct aggregation of raw events.

Scale shape: one shuffle per grain, each on (keys, truncated ts), each
input 10^3-10^5× smaller than the last; all built-in expressions,
whole-stage codegen, map-side partial aggregation on every level.

Reference parity: [EXT] — the reference has no time dimension; this is
the engine's events-table surface (SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: supported truncation grains, finest → coarsest
GRAIN_ORDER = ["minute", "hour", "day", "week", "month"]


def cascade_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    keys: list[str] | None = None,
    value_col: str = "value",
    grains: list[str] | None = None,
) -> DataFrame:
    """Roll ``df`` up through ``grains`` (finest first), each level
    aggregated FROM the previous level's aggregates. Returns the
    coarsest grain: (keys..., bucket timestamp, n_events, sum_value,
    n_finer_buckets). count/sum combine exactly; n_finer_buckets is
    the count of ACTIVE next-finer buckets (a cascade-only quantity a
    direct aggregation must reproduce with count(distinct trunc)).
    The column is present at EVERY grain count: with a single grain the
    next-finer unit is the raw event timestamp, so n_finer_buckets =
    count(distinct ts) within the bucket."""
    keys = list(keys or [])
    grains = list(grains or ["hour", "day"])
    order = {g: i for i, g in enumerate(GRAIN_ORDER)}
    if sorted(grains, key=order.__getitem__) != grains:
        raise ValueError(f"grains must be finest-first: {grains}")

    level = df.groupBy(
        *keys, F.date_trunc(grains[0], F.col(ts_col)).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(value_col).alias("sum_value"),
        # schema is grain-count-independent: at the finest level the
        # "next-finer bucket" is the raw event timestamp (recomputed by
        # the loop below at coarser grains, so harmless for len >= 2)
        F.count_distinct(F.col(ts_col)).alias("n_finer_buckets"),
    )
    for g in grains[1:]:
        level = level.groupBy(
            *keys, F.date_trunc(g, F.col("bucket")).alias("bucket")
        ).agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.count(F.lit(1)).alias("n_finer_buckets"),
        )
    return level
