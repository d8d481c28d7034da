"""Direct unit tests for the shared star-guarded pair generator —
the one skew-kill primitive all four LSH-family tiers ride on."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from dedup_spark.operators.banding import star_guarded_pairs


def _bucketed(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["_id", "b", "h"])
    ).select("_id", "b", F.col("h"))


def test_bucket_exactly_at_cap_emits_all_pairs(spark):
    rows = [(f"x{i}", 1, 10 + i) for i in range(4)]  # n == max_bucket
    got = {
        (r["id1"], r["id2"])
        for r in star_guarded_pairs(_bucketed(spark, rows), ["b"], max_bucket=4).collect()
    }
    assert len(got) == 6  # C(4,2) — cap is inclusive


def test_bucket_over_cap_stars_to_min(spark):
    rows = [(f"x{i}", 1, 0) for i in range(5)]  # n == max_bucket + 1
    got = {
        (r["id1"], r["id2"])
        for r in star_guarded_pairs(_bucketed(spark, rows), ["b"], max_bucket=4).collect()
    }
    assert got == {("x0", f"x{i}") for i in range(1, 5)}  # O(n) star


def test_multi_bucket_dedup_and_carry(spark):
    # same pair colliding in two buckets → one output row; carried
    # values come from the pair's own rows
    rows = [("a", 1, 100), ("b", 1, 200), ("a", 2, 100), ("b", 2, 200), ("c", 2, 300)]
    out = star_guarded_pairs(
        _bucketed(spark, rows), ["b"], max_bucket=64, id_col="_id", carry_cols=["h"]
    ).collect()
    pairs = {(r["id1"], r["id2"]): (r["h1"], r["h2"]) for r in out}
    assert set(pairs) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert pairs[("a", "b")] == (100, 200)
    assert pairs[("b", "c")] == (200, 300)


def test_singleton_buckets_emit_nothing(spark):
    rows = [("a", 1, 0), ("b", 2, 0)]
    assert star_guarded_pairs(_bucketed(spark, rows), ["b"], max_bucket=4).count() == 0
