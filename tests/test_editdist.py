"""Deletion-neighborhood edit-distance-1 blocking tests —
operators/editdist.py."""

from __future__ import annotations

import itertools

from dedup_spark.operators.editdist import deletion_keys, edit1_pairs
from pyspark.sql import functions as F


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_deletion_keys_dedup_repeated_chars(spark):
    df = spark.createDataFrame([("aab",)], ["s"])
    keys = df.select(deletion_keys(F.col("s")).alias("k")).collect()[0]["k"]
    # self + {ab (twice, deduped), aa}
    assert sorted(keys) == ["aa", "aab", "ab"]


def test_matches_bruteforce_on_mixed_corpus(spark):
    # substitutions, insertions, deletions, distance-2 decoys,
    # duplicate rows of the same name
    names = [
        "cat", "bat", "cut", "cats", "at", "dog", "dig", "dg",
        "edit", "edits", "edt", "xedit", "yedit", "same", "same",
        "", None, "a", "b", "ab",
    ]
    df = spark.createDataFrame([(n,) for n in names], ["name"])
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in edit1_pairs(df, col="name").collect()
    }
    uniq = sorted({n for n in names if n})
    want = {
        (a, b, 1)
        for a, b in itertools.combinations(uniq, 2)
        if _lev(a, b) == 1
    }
    assert got == want
    # sanity: the corpus exercises all three edit kinds
    assert ("bat", "cat", 1) in want  # substitution
    assert ("cat", "cats", 1) in want  # insertion
    assert ("dg", "dig", 1) in want  # deletion
    assert all(_lev(a, b) == 1 for a, b, _ in got)


def test_distance_two_never_survives_verification(spark):
    # "abc" -> "xyc" shares no deletion key with distance 2 anyway, but
    # "ab" vs "ba" DOES share keys ("a" and "b") at distance 2 —
    # verification must reject it
    df = spark.createDataFrame([("ab",), ("ba",)], ["name"])
    assert edit1_pairs(df, col="name").count() == 0


# --- end-to-end entity resolution (blocking + CC + entity ids) ---


def test_entity_resolution_transitive_chain(spark):
    import __spark_entry__ as e
    from pyspark.sql import functions as F
    from dedup_spark.operators.components import connected_components
    from dedup_spark.operators.editdist import edit1_pairs

    # chain: abc ~ abd ~ abdd; xyz isolated; duplicate record of abc
    rows = [(1, "abc"), (2, "abd"), (3, "abdd"), (4, "xyz"), (5, "abc")]
    cust = spark.createDataFrame(rows, "c_custkey long, c_name string")
    pairs = edit1_pairs(cust, col="c_name")
    asg = connected_components(
        pairs.select(F.col("name_a").alias("id1"), F.col("name_b").alias("id2"))
    ).withColumnRenamed("id", "c_name")
    rooted = cust.join(asg, "c_name", "left").select(
        "c_custkey", "c_name",
        F.coalesce("cluster_id", F.col("c_name")).alias("_root"),
    )
    ents = rooted.groupBy("_root").agg(F.min("c_custkey").alias("entity_id"))
    got = {
        r["c_custkey"]: r["entity_id"]
        for r in rooted.join(ents, "_root").collect()
    }
    # the typo chain + the byte-equal duplicate all resolve to entity 1
    assert got == {1: 1, 2: 1, 3: 1, 5: 1, 4: 4}


def test_entity_resolution_gate_shape(spark):
    import __spark_entry__ as e

    rows = e.q_entity_resolution(spark, "/root/testdata/sf0.001").collect()
    by_entity = {}
    for r in rows:
        by_entity.setdefault(r["entity_id"], []).append(r["c_custkey"])
    # every entity id is the min custkey of its members
    for eid, members in by_entity.items():
        assert eid == min(members)
    # ER on this corpus actually merges records (non-vacuous)
    assert any(len(m) >= 2 for m in by_entity.values())
