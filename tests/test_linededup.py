"""Global line-level dedup tests — operators/linededup.py."""

from __future__ import annotations

import hashlib

from dedup_spark.operators.linededup import (
    first_carrier_lines,
    line_dedup_report,
    split_token_lines,
)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_split_fixed_width_with_ragged_tail(spark):
    df = spark.createDataFrame(
        [(1, "A b c d e"), (2, "  x  Y "), (3, None), (4, "   ")],
        ["doc_id", "text"],
    )
    rows = sorted(
        (r["doc_id"], r["line_no"], r["line"])
        for r in split_token_lines(df, width=2).collect()
    )
    # lowercase normalization, width-2 windows, ragged last window,
    # null / whitespace-only docs produce no rows
    assert rows == [
        (1, 0, "a b"),
        (1, 1, "c d"),
        (1, 2, "e"),
        (2, 0, "x y"),
    ]


def test_first_carrier_is_global_min_doc_then_line(spark):
    lines = spark.createDataFrame(
        [
            (2, 0, "dup line"),  # doc 2 sees it first by line_no...
            (1, 5, "dup line"),  # ...but doc 1 wins: doc_id orders first
            (3, 1, "dup line"),
            (3, 0, "only here"),
        ],
        ["doc_id", "line_no", "line"],
    )
    got = {
        (r["doc_id"], r["line_no"]): r["kept"]
        for r in first_carrier_lines(lines).collect()
    }
    assert got == {
        (1, 5): True,
        (2, 0): False,
        (3, 1): False,
        (3, 0): True,
    }


def test_report_reassembles_kept_text_in_line_order(spark):
    # doc 1 is the carrier of everything; doc 2 shares its middle line
    # and must reassemble around the hole
    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "x y c d z w"),
        ],
        ["doc_id", "text"],
    )
    rep = {r["doc_id"]: r for r in line_dedup_report(df, width=2).collect()}
    assert rep[1]["n_lines"] == 3 and rep[1]["n_kept"] == 3
    assert rep[1]["kept_text_md5"] == _md5("a b c d e f")
    assert rep[2]["n_lines"] == 3 and rep[2]["n_kept"] == 2
    assert rep[2]["kept_text_md5"] == _md5("x y z w")
    assert abs(rep[2]["kept_ratio"] - round(2 / 3, 6)) < 1e-12


def test_fully_excised_doc_yields_null_fingerprint(spark):
    df = spark.createDataFrame(
        [(1, "same same"), (2, "same same")], ["doc_id", "text"]
    )
    rep = {r["doc_id"]: r for r in line_dedup_report(df, width=2).collect()}
    assert rep[1]["n_kept"] == 1 and rep[1]["kept_text_md5"] == _md5("same same")
    assert rep[2]["n_kept"] == 0 and rep[2]["kept_text_md5"] is None
    assert rep[2]["kept_ratio"] == 0.0
