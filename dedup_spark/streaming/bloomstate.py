"""Incremental Bloom-filter state — the streaming form of operators/bloom.

Continuous ingestion needs the cross-snapshot filter (operators/
bloom.py, the Dolma/BFF pattern) maintained ACROSS micro-batches: each
batch's keys fold into a persistent word table so that batch N+1 can be
deduplicated against everything batches 1..N ever contributed, without
rescanning history. The same foreachBatch discipline as
streaming/incremental.py's content-hash state table, with two
properties the Bloom representation gets for free:

  * the merge is a word-wise bit_or — associative, commutative and
    IDEMPOTENT, so re-running a batch after a crash converges to the
    identical filter (the at-least-once story needs no dedup of the
    updates themselves);
  * the state is bounded at m/32 rows FOREVER, regardless of how many
    keys streamed through — the one state table in the engine whose
    size is independent of the corpus.

Persistence goes through sources/catalog.write_table (the crash-safe
snapshot-and-pointer commit): a writer dying mid-merge leaves the
previous published filter intact and readable, and the batch replay
then converges by idempotence. The gate (driver query
`incremental_bloom_dedup`) is the strongest available: the
incrementally-built filter must equal the one-shot batch build
word-for-word — the oracle IS the batch formulation in SQL.

Reference parity: [EXT] streaming surface (SURVEY.md §2.4); the
reference (denizariyan/dedup) is a one-shot CLI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dedup_spark.operators.bloom import bloom_build
from dedup_spark.sources.catalog import (
    _current_snapshot,
    read_table,
    write_table,
)


def merge_bloom_batch(
    spark: SparkSession,
    batch_keys: DataFrame,
    state_target: str,
    m_bits: int,
    k: int,
    key_col: str = "key",
) -> None:
    """foreachBatch body: fold one micro-batch's keys into the
    persistent filter. Reads the current published snapshot (if any),
    ORs in the batch's words, commits a new snapshot atomically.
    Idempotent: replaying a batch cannot change the filter."""
    from pathlib import Path

    new = bloom_build(batch_keys, key_col, m_bits, k)
    if _current_snapshot(Path(state_target)) is not None:
        new = (
            read_table(spark, state_target)
            .unionByName(new)
            .groupBy("word_idx")
            .agg(F.bit_or("word").alias("word"))
        )
    write_table(new, state_target)


def read_bloom_state(spark: SparkSession, state_target: str) -> DataFrame:
    """The current published filter: (word_idx, word)."""
    return read_table(spark, state_target)
