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
