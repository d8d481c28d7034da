"""Exact duplicated-span excision (operators/spandedup.py) — the
Lee et al. 2022 ExactSubstr corpus-cleaning stage, word-gram form."""

from __future__ import annotations

from dedup_spark.operators.spandedup import duplicated_span_excision

K = 13
SHARED = " ".join(f"w{i}" for i in range(15))  # 15-word shared run


def _run(spark, rows, k=K):
    df = spark.createDataFrame(rows, "doc_id int, text string")
    return {
        r.doc_id: r for r in duplicated_span_excision(df, k=k).collect()
    }


def test_span_excision_semantics(spark):
    out = _run(
        spark,
        [
            (1, f"alpha {SHARED} beta gamma"),
            (2, f"{SHARED} delta"),
            (3, "unique " + " ".join(f"u{i}" for i in range(20))),
            (4, "short doc"),  # < k words: no grams
            (5, "   "),  # whitespace-only
            (6, SHARED),  # fully covered
        ],
    )
    assert len(out) == 6  # one row per INPUT doc
    # the shared 15-word run is cut from BOTH carriers (remove-all)
    assert out[1].cleaned_text == "alpha beta gamma"
    assert out[1].n_covered == 15 and out[1].n_words == 18
    assert out[2].cleaned_text == "delta"
    # unique doc untouched, cleaned == normalized token stream
    assert out[3].n_covered == 0
    assert out[3].cleaned_text.startswith("unique u0 u1")
    # sub-k docs and empty docs pass through
    assert out[4].n_covered == 0 and out[4].cleaned_text == "short doc"
    assert out[5].n_words == 0 and out[5].cleaned_text == ""
    # fully-covered doc excises to empty, dup_fraction exactly 1
    assert out[6].n_covered == 15 and out[6].dup_fraction == 1.0
    assert out[6].cleaned_text == ""


def test_overlapping_spans_union_not_doublecount(spark):
    # two shared runs overlapping inside one doc: coverage is a UNION
    a = " ".join(f"a{i}" for i in range(14))
    b = " ".join(f"a{i}" for i in range(7, 14)) + " " + " ".join(
        f"b{i}" for i in range(7)
    )
    carrier = a + " " + " ".join(f"b{i}" for i in range(7))  # a0..a13 b0..b6
    out = _run(spark, [(1, carrier), (2, a), (3, b)])
    # carrier: 21 words, all covered by the union of the two runs
    assert out[1].n_words == 21
    assert out[1].n_covered == 21
    assert out[1].cleaned_text == ""


def test_intra_doc_repeat_not_flagged(spark):
    # a 13-gram repeated WITHIN one doc only is not cross-doc duplicated
    run = " ".join(f"r{i}" for i in range(13))
    out = _run(spark, [(1, f"{run} mid {run}"), (2, "other words entirely")])
    assert out[1].n_covered == 0
    assert out[1].cleaned_text == f"{run} mid {run}"


def test_case_and_whitespace_normalization(spark):
    # matching is over lower(trim)+\s+ tokens: case/extra-space variants
    # of the same span still match, and output is the normalized stream
    out = _run(
        spark,
        [
            (1, "  " + SHARED.upper() + "  tail"),
            (2, SHARED.replace(" ", "   ")),
        ],
    )
    assert out[1].n_covered == 15 and out[1].cleaned_text == "tail"
    assert out[2].n_covered == 15 and out[2].cleaned_text == ""
