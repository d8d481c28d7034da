"""Token-entropy quality-signal tests — q_token_entropy."""

from __future__ import annotations

import math

import __spark_entry__ as entrymod


def _run(spark, rows, tmp_path):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return {
        r["doc_id"]: r
        for r in entrymod.q_token_entropy(spark, str(tmp_path)).collect()
    }


def test_entropy_by_hand(spark, tmp_path):
    got = _run(
        spark,
        [
            (1, "a a a a"),  # single type: H = 0, norm NULL
            (2, "a b c d"),  # uniform over 4: H = ln 4, norm 1
            (3, "a a b"),  # H = ln 3 - (2 ln 2)/3
            (4, "Mixed MIXED mixed"),  # lowercased: one type
        ],
        tmp_path,
    )
    assert got[1]["entropy"] == 0.0 and got[1]["norm_entropy"] is None
    assert got[2]["entropy"] == round(math.log(4), 6)
    assert got[2]["norm_entropy"] == 1.0
    s = int(round(2 * math.log(2) * 1e6))
    h3 = math.log(3) - s / 1e6 / 3
    assert got[3]["entropy"] == round(h3, 6)
    assert got[3]["norm_entropy"] == round(h3 / math.log(2), 6)
    assert got[4]["n_distinct"] == 1 and got[4]["entropy"] == 0.0


def test_counts(spark, tmp_path):
    got = _run(spark, [(7, "x y x z x")], tmp_path)
    assert got[7]["n_tokens"] == 5 and got[7]["n_distinct"] == 3
