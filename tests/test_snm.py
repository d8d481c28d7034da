"""Sorted-neighborhood-method tests — operators/snm.py."""

from __future__ import annotations

import itertools

import pytest

from dedup_spark.operators.snm import snm_candidate_pairs


def _brute(keys: list[str], window: int) -> set[tuple[str, str, int]]:
    order = sorted(keys)
    return {
        (order[i], order[j], j - i)
        for i, j in itertools.combinations(range(len(order)), 2)
        if j - i < window
    }


def test_matches_bruteforce_window_semantics(spark):
    keys = [f"k{i:03d}" for i in range(37)]
    # shuffle the input physically so the rank really is computed
    rows = [(k, i) for i, k in enumerate(reversed(keys))]
    df = spark.createDataFrame(rows, ["name", "rid"])
    for w in (2, 4):
        got = {
            (r["name_a"], r["name_b"], r["gap"])
            for r in snm_candidate_pairs(
                df, key_col="name", id_col="rid", window=w, n_parts=4
            ).collect()
        }
        assert got == _brute(keys, w), w
        # candidate count is exactly sum over gaps 1..w-1 of (n - gap)
        assert len(got) == sum(len(keys) - g for g in range(1, w))


def test_band_dedup_no_double_pairs(spark):
    # a pair that shares BOTH overlap bands must appear once
    df = spark.createDataFrame([("a", 1), ("b", 2)], ["name", "rid"])
    out = snm_candidate_pairs(
        df, key_col="name", id_col="rid", window=3, n_parts=2
    ).collect()
    assert len(out) == 1 and out[0]["gap"] == 1


def test_window_lower_bound(spark):
    df = spark.createDataFrame([("a", 1)], ["name", "rid"])
    with pytest.raises(ValueError):
        snm_candidate_pairs(df, key_col="name", id_col="rid", window=1)
