"""Deletion-neighborhood edit-distance-1 blocking tests —
operators/editdist.py."""

from __future__ import annotations

import itertools

from dedup_spark.operators.editdist import deletion_keys, edit1_pairs
from pyspark.sql import functions as F


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_deletion_keys_dedup_repeated_chars(spark):
    df = spark.createDataFrame([("aab",)], ["s"])
    keys = df.select(deletion_keys(F.col("s")).alias("k")).collect()[0]["k"]
    # self + {ab (twice, deduped), aa}
    assert sorted(keys) == ["aa", "aab", "ab"]


def test_matches_bruteforce_on_mixed_corpus(spark):
    # substitutions, insertions, deletions, distance-2 decoys,
    # duplicate rows of the same name
    names = [
        "cat", "bat", "cut", "cats", "at", "dog", "dig", "dg",
        "edit", "edits", "edt", "xedit", "yedit", "same", "same",
        "", None, "a", "b", "ab",
    ]
    df = spark.createDataFrame([(n,) for n in names], ["name"])
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in edit1_pairs(df, col="name").collect()
    }
    uniq = sorted({n for n in names if n})
    want = {
        (a, b, 1)
        for a, b in itertools.combinations(uniq, 2)
        if _lev(a, b) == 1
    }
    assert got == want
    # sanity: the corpus exercises all three edit kinds
    assert ("bat", "cat", 1) in want  # substitution
    assert ("cat", "cats", 1) in want  # insertion
    assert ("dg", "dig", 1) in want  # deletion
    assert all(_lev(a, b) == 1 for a, b, _ in got)


def test_distance_two_never_survives_verification(spark):
    # "abc" -> "xyc" shares no deletion key with distance 2 anyway, but
    # "ab" vs "ba" DOES share keys ("a" and "b") at distance 2 —
    # verification must reject it
    df = spark.createDataFrame([("ab",), ("ba",)], ["name"])
    assert edit1_pairs(df, col="name").count() == 0
