"""NFC canonicalization dedup tests — functions/unicode.py."""

from __future__ import annotations

import unicodedata

from dedup_spark.functions.unicode import nfc_clusters, nfc_normalize_udf
from pyspark.sql import functions as F

PRE = "caf\u00e9"  # precomposed U+00E9
DEC = "cafe\u0301"  # 'e' + U+0301 combining acute


def test_forms_collapse_without_crossing_docs(spark):
    rows = [
        (1, f"doc one {PRE}"),
        (2, f"doc one {DEC}"),  # same doc text, other form
        (3, f"doc two {PRE}"),  # different doc: must NOT merge
        (4, "plain ascii"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in nfc_clusters(df).collect()}
    assert got[1]["cluster_id"] == got[2]["cluster_id"] == 1
    assert got[3]["cluster_id"] == 3
    assert got[4]["cluster_id"] == 4
    assert not got[1]["changed"] and got[2]["changed"]
    assert not got[4]["changed"]


def test_udf_matches_unicodedata_and_preserves_null(spark):
    samples = [PRE, DEC, "A\u030a", "\u212b", "", "x"]  # angstrom forms too
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)] + [(99, None)],
        ["i", "s"],
    )
    out = {
        r["i"]: r["n"]
        for r in df.select(
            "i", nfc_normalize_udf()(F.col("s")).alias("n")
        ).collect()
    }
    for i, s in enumerate(samples):
        assert out[i] == unicodedata.normalize("NFC", s)
    assert out[99] is None


def test_nfc_idempotent(spark):
    df = spark.createDataFrame([(1, DEC)], ["doc_id", "text"])
    once = nfc_clusters(df).collect()[0]
    assert once["changed"]
    df2 = spark.createDataFrame(
        [(1, unicodedata.normalize("NFC", DEC))], ["doc_id", "text"]
    )
    twice = nfc_clusters(df2).collect()[0]
    assert not twice["changed"]
