"""Bag-of-words dedup tests."""

from __future__ import annotations

import __spark_entry__ as e


def test_bow_groups_reorderings_not_substitutions(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "the quick brown fox"),
         (2, "fox brown quick the"),        # reorder: same multiset
         (3, "the quick brown cat"),        # substitution: different
         (4, "the the quick brown fox"),    # extra dup token: different
         (5, "THE Quick Brown FOX")],       # case: same after lower
        ["doc_id", "text"],
    )
    norm = F.lower(F.trim(F.col("text")))
    key = F.sha2(F.array_join(F.sort_array(F.split(norm, r"\s+")), " "), 256)
    k = docs.select("doc_id", key.alias("bow"))
    groups = {}
    for r in k.collect():
        groups.setdefault(r["bow"], set()).add(r["doc_id"])
    sets = sorted(map(sorted, groups.values()))
    assert [1, 2, 5] in sets
    assert [3] in sets and [4] in sets


def test_gate_pairs_every_selected_doc_with_its_twin(spark):
    rows = e.q_bow_dedup(spark, "/root/testdata/sf0.001").collect()
    ids = {r["doc_id"] for r in rows}
    # every injected twin (id >= 1M) is present with its original
    twins = {i for i in ids if i >= 100_000_000}
    assert twins and all(i - 100_000_000 in ids for i in twins)
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r["doc_id"])
    for members in by_cluster.values():
        assert len(members) >= 2
