"""Bigram-LM perplexity tests — operators/lm.py."""

from __future__ import annotations

import math

from dedup_spark.operators.lm import (
    NLL_SCALE,
    perplexity_report,
    train_bigram_lm,
)


def _expected(terms: list[float]) -> tuple[float, float]:
    ssum = sum(int(round(-math.log(p) * NLL_SCALE)) for p in terms)
    avg = ssum / float(NLL_SCALE) / len(terms)
    return round(avg, 6), round(math.exp(avg), 6)


def test_counts_smoothing_and_backoff_by_hand(spark):
    # train: bigrams (a,b) x2, (b,a), (a,c); histories a:3, b:1; V=3
    train = spark.createDataFrame(
        [(0, "a b a b"), (2, "a c")], ["doc_id", "text"]
    )
    score = spark.createDataFrame(
        [
            (1, "a b"),  # seen bigram: (2+1)/(3+3)
            (3, "a z"),  # seen history, unseen bigram: (0+1)/(3+3)
            (5, "z z"),  # unseen history: 1/V = 1/3
            (7, "b c a"),  # (b,c): (0+1)/(1+3); (c,a): c unseen -> 1/3
            (9, "single"),  # < 2 tokens: no row
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r for r in perplexity_report(train, score).collect()
    }
    assert set(got) == {1, 3, 5, 7}
    cases = {
        1: [3 / 6],
        3: [1 / 6],
        5: [1 / 3],
        7: [1 / 4, 1 / 3],
    }
    for doc, ps in cases.items():
        avg, ppl = _expected(ps)
        assert got[doc]["n_bigrams"] == len(ps)
        assert got[doc]["avg_nll"] == avg, doc
        assert got[doc]["ppl"] == ppl, doc


def test_model_is_self_consistent(spark):
    # for every seen history w1, sum over TRAINING vocab of the
    # smoothed P(w2|w1) equals 1: (sum_seen(c12)+n_seen)/(c1+V)
    # + (V-n_seen)*1/(c1+V) = (c1+V)/(c1+V)
    train = spark.createDataFrame(
        [(0, "a b a c b a"), (2, "c c a b")], ["doc_id", "text"]
    )
    c12, c1, v = train_bigram_lm(train)
    V = v.collect()[0]["v"]
    hist = {r["w1"]: r["c1"] for r in c1.collect()}
    seen = {}
    for r in c12.collect():
        seen.setdefault(r["w1"], []).append(r["c12"])
    for w1, counts in seen.items():
        total = (sum(counts) + len(counts)) / (hist[w1] + V) + (
            V - len(counts)
        ) / (hist[w1] + V)
        assert abs(total - 1.0) < 1e-12


def test_uniform_backoff_scores_log_v(spark):
    train = spark.createDataFrame([(0, "a b c d")], ["doc_id", "text"])
    score = spark.createDataFrame([(1, "x y x")], ["doc_id", "text"])
    row = perplexity_report(train, score).collect()[0]
    avg, ppl = _expected([1 / 4, 1 / 4])
    assert row["avg_nll"] == avg and row["ppl"] == ppl
