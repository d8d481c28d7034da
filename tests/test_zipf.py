"""Zipf rank-frequency fit tests — q_zipf_fit."""

from __future__ import annotations

import math

import __spark_entry__ as entrymod


def _expected(counts: list[int]):
    # counts sorted desc = rank order; replicate the fixed-point sums
    xs = [int(round(math.log(r + 1) * 1e6)) for r in range(len(counts))]
    ys = [int(round(math.log(c) * 1e6)) for c in sorted(counts, reverse=True)]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    intercept = (sy / n - slope * (sx / n)) / 1e6
    return round(slope, 6), round(intercept, 6)


def _run(spark, texts, tmp_path):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return entrymod.q_zipf_fit(spark, str(tmp_path)).collect()[0]


def test_fit_by_hand(spark, tmp_path):
    # counts: a=4, b=2, c=1 (distinct counts -> rank unambiguous)
    row = _run(spark, ["a a a a b b c"], tmp_path)
    slope, intercept = _expected([4, 2, 1])
    assert row["n_vocab"] == 3
    assert row["slope"] == slope
    assert row["intercept"] == intercept


def test_true_zipf_slope_near_minus_one(spark, tmp_path):
    # counts proportional to 1/rank over 40 words
    words = [f"w{i:02d}" for i in range(40)]
    text = " ".join(
        " ".join([w] * max(1, round(120 / (r + 1))))
        for r, w in enumerate(words)
    )
    row = _run(spark, [text], tmp_path)
    assert row["n_vocab"] == 40
    assert -1.15 < row["slope"] < -0.85