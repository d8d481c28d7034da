"""Mixed-language segmentation tests — q_lang_segmentation."""

from __future__ import annotations

import __spark_entry__ as entrymod


def _run(spark, rows, tmp_path):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return {
        r["doc_id"]: r
        for r in entrymod.q_lang_segmentation(spark, str(tmp_path)).collect()
    }


def test_augmentation_rules_and_dominance(spark, tmp_path):
    # doc 1: neither rule, pure English markers -> monolingual en
    # doc 3: %3 rule -> en + de mixed
    # doc 15: %3 and %5 -> tri-lingual, dominant by line count
    en = "the cat and the dog is of to the end more pad "  # 12 tokens
    got = _run(spark, [(1, en * 2), (3, en), (15, en)], tmp_path)
    assert got[1]["dominant_lang"] == "en" and not got[1]["mixed"]
    assert got[1]["n_langs"] == 1
    assert got[3]["mixed"] and got[3]["n_langs"] == 2
    assert got[15]["n_langs"] == 3 and got[15]["mixed"]
    # doc 3: 12 en tokens = 2 lines, 10 de tokens land in lines 3-4
    # (line 3 is 2 en + 4 de -> de wins 4 markers to <=1)
    assert got[3]["n_lines"] == 4


def test_marker_free_doc_is_und(spark, tmp_path):
    got = _run(spark, [(7, "xyzzy plugh foobar quux")], tmp_path)
    assert got[7]["dominant_lang"] == "und"
    assert got[7]["n_langs"] == 0 and not got[7]["mixed"]
    assert got[7]["n_lang_lines"] == 0 and got[7]["n_lines"] == 1


def test_tie_breaks_alphabetical(spark, tmp_path):
    # one line with equal en and es scores: 'el que es' vs 'the is'
    # es markers: el(1) que(1) es(1) = 3; en: the(1) is(1) = 2 -> es?
    # build a real tie: 'the is el que' -> en 2, es 2 -> 'en' < 'es'
    got = _run(spark, [(2, "the is el que")], tmp_path)
    assert got[2]["dominant_lang"] == "en"
