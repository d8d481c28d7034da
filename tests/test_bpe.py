"""BPE merge-induction tests — operators/bpe.py, checked against an
independent plain-Python BPE trainer."""

from __future__ import annotations

from collections import Counter

import pytest

from dedup_spark.operators.bpe import bpe_merges, word_frequencies


def _python_bpe(word_counts: dict[str, int], k: int):
    """Reference trainer: list-of-symbols representation (no marked
    strings), greedy leftmost merge."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for rank in range(1, k + 1):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            return merges
        # (freq desc, pair asc) on the marked-string ordering: the
        # engine compares "\x01a \x01b" strings, which for equal-freq
        # pairs orders by (a, b) lexicographically — same as tuple asc
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), freq = best
        merges.append((rank, a, b, a + b, freq))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def _spark_merges(spark, texts, k):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    return [
        (r["rank"], r["sym_left"], r["sym_right"], r["merged"], r["freq"])
        for r in bpe_merges(word_frequencies(docs), k=k)
        .orderBy("rank")
        .collect()
    ]


def test_matches_reference_trainer_with_composition(spark):
    texts = ["low lower lowest low low", "newer newest wider low"]
    words = Counter(w for t in texts for w in t.split())
    k = 6
    assert _spark_merges(spark, texts, k) == _python_bpe(words, k)


def test_greedy_overlap_aaa(spark):
    # 'aaa' + merge(a,a): greedy leftmost -> ['aa','a'], so round 2's
    # top pair is ('aa','a')
    got = _spark_merges(spark, ["aaa aaa aaa"], 2)
    assert got[0][1:4] == ("a", "a", "aa")
    assert got[1][1:4] == ("aa", "a", "aaa")


def test_tiebreak_is_lexicographic(spark):
    # 'ab' and 'cd' both occur twice: (a,b) wins on pair asc
    got = _spark_merges(spark, ["ab cd ab cd"], 1)
    assert got == [(1, "a", "b", "ab", 2)]


def test_exhaustion_raises(spark):
    with pytest.raises(ValueError):
        _spark_merges(spark, ["a b c"], 1)  # single-char words: no pairs


# --- tokenizer application (apply_merges / doc_token_counts) ---


def test_apply_merges_hand_computed(spark):
    from dedup_spark.operators.bpe import apply_merges

    words = spark.createDataFrame(
        [("aaab",), ("ab",), ("ba",), ("c",)], ["word"]
    )
    # merge 1: a+a -> aa ; merge 2: a+b -> ab
    got = {
        r["word"]: r["n_tokens"]
        for r in apply_merges(words, [("a", "a"), ("a", "b")]).collect()
    }
    # aaab: a a a b -> aa a b -> aa ab = 2 tokens
    assert got == {"aaab": 2, "ab": 1, "ba": 2, "c": 1}


def test_doc_token_counts_matches_python(spark):
    from dedup_spark.operators.bpe import doc_token_counts

    docs = spark.createDataFrame(
        [(1, "the cat the hat"), (2, "the the"), (3, "x")],
        ["doc_id", "text"],
    )
    merges = [("t", "h"), ("th", "e")]

    def enc(word):
        syms = list(word)
        for l, r in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"], r["compression"])
        for r in doc_token_counts(docs, merges).collect()
    }
    import re

    for did, text in [(1, "the cat the hat"), (2, "the the"), (3, "x")]:
        ws = re.split(r"\s+", text.lower().strip())
        nt = sum(enc(w) for w in ws)
        assert got[did] == (len(ws), nt, round(nt / len(ws), 6)), did


def test_merges_reduce_token_count(spark):
    # applying the learned merges must never increase token counts and
    # must strictly shrink the corpus the merges were trained on
    from dedup_spark.operators.bpe import (
        apply_merges,
        bpe_merges,
        word_frequencies,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, "banana bandana ananas") for i in range(5)],
        ["doc_id", "text"],
    )
    wf = word_frequencies(docs)
    merges = [
        (r["sym_left"], r["sym_right"])
        for r in bpe_merges(wf, k=3).orderBy("rank").collect()
    ]
    enc = apply_merges(wf.select("word"), merges)
    chars = {r["word"]: len(r["word"]) for r in wf.select("word").collect()}
    for r in enc.collect():
        assert r["n_tokens"] < chars[r["word"]], r["word"]
