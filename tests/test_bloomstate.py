"""Incremental Bloom state tests — streaming/bloomstate.py."""

from __future__ import annotations

import os

from dedup_spark.operators.bloom import bloom_build
from dedup_spark.sources.catalog import vacuum_table
from dedup_spark.streaming.bloomstate import (
    merge_bloom_batch,
    read_bloom_state,
)

M, K = 1 << 12, 3
KEYS = [f"stream key number {i}" for i in range(90)]


def _words(df):
    return {r["word_idx"]: r["word"] for r in df.collect()}


def test_incremental_equals_batch_build(spark, tmp_path):
    state = str(tmp_path / "bloom_state")
    for lo in (0, 30, 60):  # three micro-batches
        batch = spark.createDataFrame(
            [(x,) for x in KEYS[lo:lo + 30]], ["key"]
        )
        merge_bloom_batch(spark, batch, state, M, K)
    full = spark.createDataFrame([(x,) for x in KEYS], ["key"])
    assert _words(read_bloom_state(spark, state)) == _words(
        bloom_build(full, "key", M, K)
    )


def test_replay_is_idempotent(spark, tmp_path):
    """The at-least-once / crash-recovery case: re-merging a batch
    cannot change the filter (bit_or idempotence)."""
    state = str(tmp_path / "bloom_state")
    batch = spark.createDataFrame([(x,) for x in KEYS[:40]], ["key"])
    merge_bloom_batch(spark, batch, state, M, K)
    once = _words(read_bloom_state(spark, state))
    merge_bloom_batch(spark, batch, state, M, K)
    assert _words(read_bloom_state(spark, state)) == once


def test_state_stays_bounded_and_snapshots_accumulate(spark, tmp_path):
    """The filter is <= M/32 rows no matter how many keys stream in;
    each merge publishes a NEW snapshot (crash at any point leaves the
    previous one readable — write_table's contract), and vacuum prunes
    the superseded ones."""
    state = str(tmp_path / "bloom_state")
    for lo in (0, 30, 60):
        batch = spark.createDataFrame(
            [(x,) for x in KEYS[lo:lo + 30]], ["key"]
        )
        merge_bloom_batch(spark, batch, state, M, K)
    assert read_bloom_state(spark, state).count() <= M // 32
    snaps = [d for d in os.listdir(state) if d.startswith("snap-")]
    assert len(snaps) == 3
    removed = vacuum_table(state)
    assert len(removed) == 2  # both superseded snapshots pruned
    # still readable after GC
    assert read_bloom_state(spark, state).count() <= M // 32
