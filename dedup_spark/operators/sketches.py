"""From-scratch distributed sketches with EXACT cross-engine parity.

The engine already exposes Spark's built-in sketch tier
(`sketch_stats`: HLL++ / GK quantiles, gated within advertised error).
This module is the complementary posture: the sketches themselves
built as plain DataFrame aggregations from public formulas, so the
oracle can recompute the ESTIMATE bit-for-bit — the sketch is not a
black box, and on a real cluster the same code is the mergeable
per-partition state (a register table IS a sum-combinable aggregate).

HyperLogLog (Flajolet et al. 2007, the standard m >= 128 variant):
  * engine-portable 60-bit hash: first 15 hex digits of md5 (the
    repo's established conv(hex, 16, 10) trick — both engines agree);
  * register index = low 8 bits (m = 256), remainder w = h >> 8
    (52 bits); rho = leading zeros of w in 52-bit width + 1 =
    53 - bitlength(w), computed EXACTLY via the minimal binary string
    (conv(w, 10, 2) / bin(w) — no float log anywhere);
  * registers = ONE map-side-combinable groupBy(idx).max(rho);
  * the harmonic sum is kept INTEGER: sum of 2^(53 - M_j) plus
    2^53 per never-touched register (max 2^61, fits BIGINT), so the
    only doubles are the final alpha*m^2*2^53/S division and the
    small-range ln correction — identical IEEE ops in both engines.

Count-min sketch (Cormode & Muthukrishnan 2005) lives beside it:
  * d = 4 rows x 512 buckets, row hashes = the 4 disjoint 8-hex-digit
    slices of the SAME md5 (32 bits per row — independent enough for
    the gate corpus, zero extra hashing cost);
  * the table is ONE groupBy(row, bucket).sum(weight) — mergeable
    by addition, the property that makes CMS the scale substitute for
    exact key counting when the key space doesn't fit;
  * a point estimate is min over the d bucket counts — with the
    one-sided guarantee estimate >= true count, which the gate pins
    row-for-row against exact counts.

Reference parity: [EXT] LLM-pipeline surface (SURVEY.md §2.4) — the
sketch tier of the profiling surface (`key_skew_profile` is the exact
top-k variant; CMS is what replaces it when exact per-key state is
too large, HLL what replaces exact distinct counts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers
HLL_HASH_BITS = 60  # 15 hex digits of md5
HLL_W = HLL_HASH_BITS - HLL_P  # 52-bit remainder
HLL_SC = HLL_W + 1  # fixed-point scale: max rho = 53
# standard alpha_m for m >= 128; a Python-evaluated literal so both
# engines consume the identical double
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)

CMS_D = 4
CMS_W = 512  # buckets per row


def _hash60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hll_registers(keys: DataFrame, key_col: str = "key") -> DataFrame:
    """(idx, rho) register table — one combinable aggregation. Merging
    two corpora's registers is max-combinable by construction."""
    h = _hash60(F.col(key_col))
    w = F.shiftright(h, HLL_P)
    rho = F.when(
        w == 0, F.lit(HLL_SC).cast("int")
    ).otherwise(
        (F.lit(HLL_SC) - F.length(F.conv(w.cast("string"), 10, 2))).cast(
            "int"
        )
    )
    return (
        keys.select(
            (h % HLL_M).cast("int").alias("idx"), rho.alias("rho")
        )
        .groupBy("idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame) -> DataFrame:
    """One-row (estimate, n_zero_registers, small_range) from a
    register table. Integer harmonic sum; doubles only in the final
    division / ln correction."""
    contrib = F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_SC} - rho)")
    s = registers.agg(
        F.sum(contrib).cast("long").alias("_s"),
        F.count(F.lit(1)).cast("long").alias("_present"),
    )
    zeros = F.lit(HLL_M) - F.col("_present")
    s_full = F.col("_s") + zeros * F.expr(
        f"shiftleft(CAST(1 AS BIGINT), {HLL_SC})"
    )
    e_raw = (
        F.lit(HLL_ALPHA * HLL_M * HLL_M)
        * F.expr(f"CAST(shiftleft(CAST(1 AS BIGINT), {HLL_SC}) AS DOUBLE)")
        / s_full.cast("double")
    )
    small = (e_raw <= F.lit(2.5 * HLL_M)) & (zeros > 0)
    est = F.when(
        small, F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros)
    ).otherwise(e_raw)
    return s.select(
        F.round(est, 6).alias("hll_estimate"),
        zeros.cast("long").alias("n_zero_registers"),
        small.alias("small_range"),
    )


def cms_table(
    keys: DataFrame, key_col: str = "key", weight_col: str | None = None
) -> DataFrame:
    """(row, bucket, cnt) count-min table — one combinable aggregation
    over d replicated hash rows; mergeable by per-cell addition."""
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    rows = []
    for d in range(CMS_D):
        h = F.conv(
            F.substring(F.md5(F.col(key_col)), 1 + 8 * d, 8), 16, 10
        ).cast("long")
        rows.append(
            keys.select(
                F.lit(d).alias("row"),
                (h % CMS_W).cast("int").alias("bucket"),
                w.alias("_w"),
            )
        )
    union = rows[0]
    for r in rows[1:]:
        union = union.unionAll(r)
    return union.groupBy("row", "bucket").agg(
        F.sum("_w").cast("long").alias("cnt")
    )


def cms_point_estimates(
    table: DataFrame, queries: DataFrame, key_col: str = "key"
) -> DataFrame:
    """min-over-rows point estimate for each query key: (key,
    cms_estimate). Joins the d (row, bucket) cells per key against the
    table — d broadcast-sized lookups, never a scan per key."""
    probes = []
    for d in range(CMS_D):
        h = F.conv(
            F.substring(F.md5(F.col(key_col)), 1 + 8 * d, 8), 16, 10
        ).cast("long")
        probes.append(
            queries.select(
                key_col,
                F.lit(d).alias("row"),
                (h % CMS_W).cast("int").alias("bucket"),
            )
        )
    union = probes[0]
    for p in probes[1:]:
        union = union.unionAll(p)
    return (
        union.join(table, ["row", "bucket"])
        .groupBy(key_col)
        .agg(F.min("cnt").cast("long").alias("cms_estimate"))
    )
