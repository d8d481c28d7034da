"""Distributed Bloom-filter membership — the BFF-style dedup primitive.

The public recipe (Dolma / "BFF" bloom-filter-filter, and every
cross-snapshot dedup at web scale): build a Bloom filter over the
reference corpus's keys ONCE, then probe new data against the filter
instead of joining against the full reference key set. The reference
side is scanned exactly once and collapses to m/64 64-bit words; probes
never shuffle reference keys again — the asymmetry that makes
"dedup snapshot N+1 against snapshots 1..N" affordable when the
reference is 100 TB and the increment is 1 TB.

Spark formulation (all JVM built-ins, zero UDFs):
  * k bit positions per key from md5 — position_i =
    conv(substr(md5(i || ':' || key), 1, 15), 16, 10) % m. md5 is
    engine-portable (the DuckDB oracle recomputes identical positions),
    15 hex digits fit a signed 64-bit int, and distinct i-prefixes give
    k independent hashes.
  * the filter itself is a DataFrame of (word_idx, word) — positions
    explode to (pos div 32, pos % 32) and a map-side-combinable
    `bit_or(shiftleft(1, bit))` aggregation ORs each word's bits
    together. 32-bit payloads in a BIGINT keep every word positive
    (no sign games in either engine).
  * probing explodes each probe key to its k (word_idx, bit) pairs,
    joins the bitmap on word_idx, and ANDs the k tested bits:
    candidate iff every position is set. With m sized for the usual
    sub-1% fill-per-hash the bitmap is tiny (m=2^17 -> 4096 rows) and
    the join broadcasts; at larger m it degrades gracefully to a
    shuffle join on word_idx — both plans never touch the reference
    keys again.

False-positive contract: candidates are a SUPERSET of true members
(zero false negatives — bit_or only ever adds bits); the expected FP
rate is (1 - e^(-kn/m))^k. Callers either accept the FP rate (dedup
drops a few extra rows) or verify candidates with an exact join whose
input is now FP-rate-sized, not corpus-sized.

Reference parity: [EXT] LLM-pipeline surface (SURVEY.md §2.4); the
reference (denizariyan/dedup) is a single-corpus exact CLI with no
cross-snapshot story — this is the operator a user needs the moment
yesterday's corpus is already deduped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

BITS_PER_WORD = 32  # 32 live bits in a BIGINT word keeps values positive


def _bit_positions(key: Column, m_bits: int, k: int) -> Column:
    """Array of the k Bloom bit positions for ``key`` (engine-portable:
    md5 of 'i:key', first 15 hex digits as an integer, mod m)."""
    return F.array(
        *[
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{i}:"), key)), 1, 15),
                16,
                10,
            ).cast("long")
            % m_bits
            for i in range(k)
        ]
    )


def bloom_build(
    keys: DataFrame, key_col: str, m_bits: int, k: int
) -> DataFrame:
    """Build the filter: (word_idx long, word long) — one row per
    64-bit-stored 32-bit word that has at least one bit set. ONE
    pass over the reference keys, one map-side-combinable aggregation;
    reference keys never ship anywhere again."""
    if m_bits % BITS_PER_WORD != 0:
        raise ValueError("m_bits must be a multiple of BITS_PER_WORD")
    pos = keys.select(
        F.explode(_bit_positions(F.col(key_col), m_bits, k)).alias("pos")
    )
    return (
        pos.select(
            (F.col("pos") / BITS_PER_WORD).cast("long").alias("word_idx"),
            (F.col("pos") % BITS_PER_WORD).alias("bit"),
        )
        .groupBy("word_idx")
        # SQL form: the pyspark shiftleft() wrapper only takes a literal
        # shift amount, the SQL expression takes a column
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").alias("word"))
    )


def bloom_probe(
    probes: DataFrame,
    bitmap: DataFrame,
    key_col: str,
    m_bits: int,
    k: int,
    out_col: str = "bloom_candidate",
    broadcast_bitmap: bool = True,
) -> DataFrame:
    """Append ``out_col`` (boolean): true iff all k of the probe key's
    bits are set in ``bitmap``. Input rows pass through unchanged
    (keyed by key_col — callers probe DISTINCT keys and join back, the
    same economics as the exact tier's hash pass).

    ``broadcast_bitmap`` fits the m≤2^22-ish regime; at web-scale m the
    caller flips it off and the probe becomes a plain shuffle join on
    word_idx — same plan shape, no code change."""
    bm = F.broadcast(bitmap) if broadcast_bitmap else bitmap
    exploded = probes.select(
        F.col(key_col),
        F.explode(_bit_positions(F.col(key_col), m_bits, k)).alias("pos"),
    ).select(
        key_col,
        (F.col("pos") / BITS_PER_WORD).cast("long").alias("word_idx"),
        (F.col("pos") % BITS_PER_WORD).alias("bit"),
    )
    hits = (
        exploded.join(bm, on="word_idx", how="left")
        .select(
            key_col,
            F.expr(
                "shiftright(coalesce(word, CAST(0 AS BIGINT)), bit) % 2 = 1"
            ).alias("hit"),
        )
        .groupBy(key_col)
        .agg(F.bool_and("hit").alias(out_col))  # AND over the k tested bits
    )
    return probes.join(hits, on=key_col, how="left")
