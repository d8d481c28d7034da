"""Temporal joins Spark lacks as built-ins: AS-OF join and RANGE join.

Both are standard time-series operators (public: pandas merge_asof,
DuckDB/QuestDB ASOF JOIN, kdb aj; Spark has neither as a physical
operator) re-expressed as shuffle-disciplined DataFrame plans:

* **as-of join** — for every left row, the single latest right row of
  the same key with ``r.ts <= l.ts`` (backward direction). Implemented
  as the union-and-forward-fill recipe: tag both sides, union, one
  window per key ordered by (ts, tag) with right rows sorting BEFORE
  left rows at equal ts (so ties match, the ``<=`` contract), then
  ``last(..., ignorenulls=True)`` carries the most recent right values
  forward onto each left row. ONE shuffle on the key; the per-key sort
  is the same work a sort-merge join would do; no driver state. Skewed
  keys: the window is per-key — a pathological key can be range-salted
  with boundary carry-over (two-pass, same trick as
  operators/ordering.py's bucketed scan); not needed at gate scale.

* **range join** — all (left, right) pairs of the same key with
  ``r.ts`` in ``[l.ts - upper, l.ts - lower]`` (a "preceding window"
  interval join). A naive theta-join is quadratic per key; here right
  rows are bucketed by ``floor(ts/W)`` with ``W = upper - lower`` and
  each LEFT row probes the (at most two) consecutive buckets its
  window can overlap, so the join is an equi-join on (key, bucket)
  with an exact residual filter — candidate volume is linear in rows
  for a fixed window, never all-pairs. Each qualifying pair is emitted
  exactly once (the left row probes distinct buckets and the right row
  lives in exactly one).

Oracle parity: DuckDB has a NATIVE ``ASOF LEFT JOIN`` — the engine's
from-scratch distributed plan is gated against the reference
implementation of the semantics, not a re-derivation; the range join
is gated against the plain quadratic inequality join.

Reference parity: [EXT] (SURVEY.md §2.4); no reference counterpart.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def epoch_us(c: Column) -> Column:
    """Microseconds since 1970-01-01 00:00:00, timezone-FREE: the NTZ
    literal makes timestamp_diff operate on the naive wall-clock value,
    matching DuckDB's epoch_us over naive timestamps — unlike
    unix_micros, which requires TIMESTAMP_LTZ and would shift by the
    session timezone."""
    return F.timestamp_diff(
        "MICROSECOND", F.to_timestamp_ntz(F.lit("1970-01-01 00:00:00")), c
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_cols: tuple[str, ...] = (),
    suffix: str = "_matched",
) -> DataFrame:
    """Backward as-of LEFT join: every left row gains
    ``<ts_col><suffix>`` (the matched right timestamp, null if no
    right row precedes) and ``<c><suffix>`` for each c in right_cols.
    Ties (equal ts) match, per the ``<=`` contract.

    The carried right columns are forward-filled as ONE struct, not
    independently: a matched right row whose value column is NULL must
    yield that NULL (the ASOF contract), not resurrect a non-null
    value from an older row — per-column ignorenulls fills would pair
    a (ts, value) that never co-occurred.

    When several right rows share the same (key, ts), the one with the
    GREATEST payload struct (field order: matched ts, then right_cols)
    wins — the payload participates in the window ordering, so last()
    is deterministic rather than picking whichever duplicate happened
    to be physically last. (DuckDB's native ASOF pick among exact-ts
    duplicates is arbitrary; fixtures keep (key, ts) unique on the
    right so the oracle gate is insensitive to either choice.)"""
    r2 = right.select(
        F.col(on),
        F.col(ts_col),
        F.struct(
            F.col(ts_col).alias(ts_col + suffix),
            *[F.col(c).alias(c + suffix) for c in right_cols],
        ).alias("_r_payload"),
        F.lit(0).alias("_tag"),
    )
    l2 = left.withColumn("_tag", F.lit(1))
    u = l2.unionByName(r2, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(
            F.col(ts_col).asc(),
            F.col("_tag").asc(),
            # deterministic tie-break among right rows sharing ts:
            # greatest payload struct wins (left rows have a null
            # payload; asc_nulls_first keeps them from interleaving)
            F.col("_r_payload").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn(
        "_r_payload", F.last("_r_payload", ignorenulls=True).over(w)
    )
    out = u.filter(F.col("_tag") == 1)
    for c in [ts_col + suffix] + [c + suffix for c in right_cols]:
        out = out.withColumn(c, F.col(f"_r_payload.{c}"))
    return out.drop("_tag", "_r_payload")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    lower_s: int = 0,
    upper_s: int = 3600,
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """All pairs of the same key with right.ts in
    ``[left.ts - upper_s, left.ts - lower_s]`` (seconds; a preceding
    window when lower_s >= 0). Returns every left column prefixed
    ``left_prefix`` and right column prefixed ``right_prefix``.
    Bucketed equi-join, never an all-pairs theta join."""
    if upper_s <= lower_s:
        raise ValueError("upper_s must exceed lower_s")
    w_us = (upper_s - lower_s) * 1_000_000
    lo_us = lower_s * 1_000_000
    up_us = upper_s * 1_000_000

    l2 = left.select(
        F.col(on).alias("_k"),
        epoch_us(F.col(ts_col)).alias("_lus"),
        *[F.col(c).alias(left_prefix + c) for c in left.columns],
    )
    r2 = right.select(
        F.col(on).alias("_k"),
        epoch_us(F.col(ts_col)).alias("_rus"),
        *[F.col(c).alias(right_prefix + c) for c in right.columns],
    ).withColumn("_b", F.floor(F.col("_rus") / w_us))
    # the left window [lus-up, lus-lo] spans width W, so it overlaps at
    # most the two consecutive buckets containing its endpoints
    probes = l2.withColumn(
        "_b",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor((F.col("_lus") - up_us) / w_us),
                    F.floor((F.col("_lus") - lo_us) / w_us),
                )
            )
        ),
    )
    return (
        probes.join(r2, on=["_k", "_b"])
        .filter(
            (F.col("_rus") >= F.col("_lus") - up_us)
            & (F.col("_rus") <= F.col("_lus") - lo_us)
        )
        .drop("_k", "_b", "_lus", "_rus")
    )
