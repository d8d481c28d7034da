"""Distributed suffix array (prefix doubling) — order + dedup-tier laws.

The ground truth is built in plain Python over the same `_norm_tokens`
word stream: suffixes as word tuples (Python tuple comparison IS the
sentinel convention — a doc-end behaves as smaller than every word),
cross-doc byte-identical full suffixes tie-broken by (id, pos) exactly
as `suffix_array` documents.
"""

from __future__ import annotations

import pytest

from dedup_spark.operators.suffixarray import (
    prefix_doubling_ranks,
    repeated_window_stats,
    suffix_array,
    word_positions,
)

DOCS = [
    # shared 5-word run across d1/d2 (cross-doc spans), intra-doc
    # repetition in d3, d4 == d5 byte-identical (full-suffix ties),
    # d6 empty, d7 shorter than every window, whitespace + case noise
    ("d1", "The quick brown fox jumps over the lazy dog tonight"),
    ("d2", "a quick brown fox jumps over the fence"),
    ("d3", "spam spam spam spam spam ham spam spam spam spam spam"),
    ("d4", "identical twin document body here now"),
    ("d5", "identical twin document body here now"),
    ("d6", "   "),
    ("d7", "tiny"),
]


def _tok(text: str) -> list[str]:
    t = text.strip().lower()
    return t.split() if t else []


def _corpus():
    return {i: _tok(t) for i, t in DOCS}


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, schema="doc_id string, text string")


def test_word_positions_contract(spark, docs_df):
    rows = word_positions(docs_df).collect()
    got = {(r["id"], r["pos"]): (r["word"], r["n_words"]) for r in rows}
    exp = {
        (i, p + 1): (w, len(ws))
        for i, ws in _corpus().items()
        for p, w in enumerate(ws)
    }
    assert got == exp  # 1-based, empty doc contributes nothing


def test_suffix_array_matches_python_suffix_sort(spark, docs_df):
    sa = {
        (r["id"], r["pos"]): r["sa_pos"]
        for r in suffix_array(docs_df).collect()
    }
    suffixes = [
        (tuple(ws[p:]), i, p + 1)
        for i, ws in _corpus().items()
        for p in range(len(ws))
    ]
    expected = {
        (i, pos): rank
        for rank, (_, i, pos) in enumerate(sorted(suffixes))
    }
    assert sa == expected


@pytest.mark.parametrize("window", [1, 2, 4, 8])
def test_rank_equality_is_window_equality(spark, docs_df, window):
    """The construction invariant, checked directly: restricted to
    full-window positions, rank equality <=> window-word equality."""
    ranks = prefix_doubling_ranks(
        word_positions(docs_df), window=window
    ).collect()
    corpus = _corpus()
    by_rank: dict[int, set[tuple[str, ...]]] = {}
    windows = []
    for r in ranks:
        ws = corpus[r["id"]]
        if r["pos"] + window - 1 <= len(ws):
            w = tuple(ws[r["pos"] - 1 : r["pos"] - 1 + window])
            by_rank.setdefault(r["rank"], set()).add(w)
            windows.append((w, r["rank"]))
    # same rank -> same window
    assert all(len(v) == 1 for v in by_rank.values())
    # same window -> same rank
    seen: dict[tuple[str, ...], int] = {}
    for w, rk in windows:
        assert seen.setdefault(w, rk) == rk


def test_window_must_be_power_of_two(spark, docs_df):
    with pytest.raises(ValueError):
        prefix_doubling_ranks(word_positions(docs_df), window=6)


@pytest.mark.parametrize("window", [2, 4])
def test_repeated_window_stats_vs_bruteforce(spark, docs_df, window):
    got = {
        r["doc_id"]: (
            r["n_windows"],
            r["n_dup_windows"],
            r["n_cross_doc_windows"],
            r["dup_window_fraction"],
        )
        for r in repeated_window_stats(docs_df, window=window).collect()
    }
    corpus = _corpus()
    occ: dict[tuple[str, ...], list[str]] = {}
    for i, ws in corpus.items():
        for p in range(len(ws) - window + 1):
            occ.setdefault(tuple(ws[p : p + window]), []).append(i)
    exp = {}
    for i, ws in corpus.items():
        wins = [
            tuple(ws[p : p + window])
            for p in range(len(ws) - window + 1)
        ]
        nd = sum(1 for w in wins if len(occ[w]) >= 2)
        nc = sum(1 for w in wins if len(set(occ[w])) >= 2)
        frac = round(nd / len(wins), 6) if wins else 0.0
        exp[i] = (len(wins), nd, nc, frac)
    assert got == exp
    # the doc roster is complete: short/empty docs report zeros
    assert got["d6"] == (0, 0, 0, 0.0)
    assert got["d7"][0] == (1 if window == 1 else 0)


def test_cross_doc_flood_is_detected(spark):
    """200 copies of one caption + 1 unique doc: every full window of
    every copy is cross-doc duplicated; the unique doc reports zero."""
    text = "one two three four five six seven eight"
    rows = [(f"c{i}", text) for i in range(200)] + [
        ("u", "alpha beta gamma delta epsilon zeta eta theta")
    ]
    df = spark.createDataFrame(rows, schema="doc_id string, text string")
    out = {
        r["doc_id"]: r for r in repeated_window_stats(df, window=4).collect()
    }
    assert out["u"]["n_dup_windows"] == 0
    assert all(
        out[f"c{i}"]["n_dup_windows"] == 5
        and out[f"c{i}"]["n_cross_doc_windows"] == 5
        and out[f"c{i}"]["dup_window_fraction"] == 1.0
        for i in range(200)
    )
