"""Text-analysis function tests (token counting, language ID, quality,
fingerprint) + formatter goldens (reference src/util.rs:31-53)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dedup_spark.functions import text as TX
from dedup_spark.functions.formatting import format_bytes, format_number


def _one(spark, s, col):
    df = spark.createDataFrame(pd.DataFrame({"t": [s]}))
    return df.select(col(F.col("t")).alias("v")).first()["v"]


def test_token_count(spark):
    assert _one(spark, "", TX.token_count) == 0
    assert _one(spark, "   ", TX.token_count) == 0
    assert _one(spark, "one", TX.token_count) == 1
    assert _one(spark, "  a\tb\nc  ", TX.token_count) == 3


def test_lang_id_markers(spark):
    assert _one(spark, "the cat is on the mat and happy", TX.lang_id) == "en"
    assert _one(spark, "der hund und die katze ist da", TX.lang_id) == "de"
    assert _one(spark, "le chat et la souris est ici", TX.lang_id) == "fr"
    assert _one(spark, "el perro que corre es rapido los dias", TX.lang_id) == "es"
    assert _one(spark, "我 的 书 是 在 那里", TX.lang_id) == "zh"
    assert _one(spark, "zzz qqq www", TX.lang_id) == "und"


def test_lang_id_tie_breaks_alphabetically(spark):
    # "la" is a marker for BOTH es and fr -> tie -> alphabetical: es
    assert _one(spark, "la la", TX.lang_id) == "es"


def test_quality_score_bounds_and_monotony(spark):
    good = "the quick brown fox jumps over a lazy dog in the bright morning light today"
    bad = "!!! ??? ### $$$ %%%"
    qg = _one(spark, good, TX.quality_score)
    qb = _one(spark, bad, TX.quality_score)
    assert 0.0 <= qb < qg <= 1.0


def test_fingerprint_normalization_equivalence(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"t": ["Hello,   World!", "hello world", "hello  worlds"]})
    )
    fps = [r["v"] for r in df.select(TX.fingerprint(F.col("t")).alias("v")).collect()]
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


def test_format_number_golden():
    # reference src/util.rs tests: spaces as thousands separators
    assert format_number(0) == "0"
    assert format_number(999) == "999"
    assert format_number(1000) == "1 000"
    assert format_number(1234567) == "1 234 567"


def test_format_bytes_golden():
    # reference src/util.rs: 1024 base, 2 decimals
    assert format_bytes(0) == "0 B"
    assert format_bytes(1023) == "1023 B"
    assert format_bytes(1536) == "1.50 KB"
    assert format_bytes(1024 * 1024) == "1.00 MB"
    assert format_bytes(int(2.5 * 1024**3)) == "2.50 GB"


def test_subword_count_bpe_ish(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from dedup_spark.functions.text import subword_count

    rows = [
        ("a", "hello world", 2),          # two word runs
        ("b", "it's 2024!", 5),           # it + ' + s + 2024 + !
        ("c", "", 0),
        ("d", "   ", 0),
        ("e", "co-op", 3),                # co + - + op
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["i", "t", "want"]))
    got = {r["i"]: r["n"] for r in df.select("i", subword_count(F.col("t")).alias("n")).collect()}
    want = {r[0]: r[2] for r in rows}
    assert got == want


def test_formatter_column_forms_match_python(spark):
    """The Spark-expression formatters (what the driver oracle checks)
    must render byte-for-byte what the driver-side Python renders,
    across every unit branch and its boundaries."""
    import pandas as pd
    from pyspark.sql import functions as F

    from dedup_spark.functions.formatting import (
        format_bytes, format_bytes_col, format_number, format_number_col,
    )

    vals = [
        0, 1, 999, 1000, 1023, 1024, 1025, 1536, 1024**2 - 1, 1024**2,
        10 * 1024**2 + 7, 1024**3, 5 * 1024**3 + 12345, 1024**4,
        1024**5, 3 * 1024**5 + 99, 123456789,
    ]
    df = spark.createDataFrame(pd.DataFrame({"n": vals}), "n long")
    got = df.select(
        "n",
        format_number_col(F.col("n")).alias("fn"),
        format_bytes_col(F.col("n")).alias("fb"),
    ).collect()
    for r in got:
        assert r["fn"] == format_number(r["n"]), r["n"]
        assert r["fb"] == format_bytes(r["n"]), r["n"]
