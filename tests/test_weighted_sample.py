"""A-ES weighted-sampling tests — operators/assembly.py
weighted_sample_keys."""

from __future__ import annotations

import hashlib
import math

from dedup_spark.operators.assembly import weighted_sample_keys


def _py_aes(rows, seed, k):
    scored = []
    for rid, w in rows:
        if w is None or w <= 0:
            continue
        h = int(
            hashlib.md5(f"{seed}:{rid}".encode()).hexdigest()[:15], 16
        )
        u = (h + 1) / float(1 << 60)
        scored.append((rid, w, math.exp(math.log(u) / w)))
    scored.sort(key=lambda t: (-t[2], t[0]))
    return [(rid, w, round(s, 6)) for rid, w, s in scored[:k]]


def test_matches_python_reference(spark):
    rows = [(i, (i * 7) % 100 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = [
        (r["doc_id"], r["weight"], r["score"])
        for r in weighted_sample_keys(
            df, id_col="doc_id", weight_col="w", seed="s1", k=20
        )
        .orderBy("doc_id")
        .collect()
    ]
    assert sorted(got) == sorted(_py_aes(rows, "s1", 20))


def test_null_and_nonpositive_weights_excluded(spark):
    rows = [(1, 5), (2, None), (3, 0), (4, -2), (5, 5)]
    df = spark.createDataFrame(rows, "doc_id long, w int")
    got = {r["doc_id"] for r in weighted_sample_keys(
        df, id_col="doc_id", weight_col="w", seed="s", k=10
    ).collect()}
    assert got == {1, 5}


def test_selection_is_weight_proportional(spark):
    # two weight classes 1 vs 20: across many seeds the heavy class
    # must dominate selections (statistical, generous margin)
    rows = [(i, 20 if i < 50 else 1) for i in range(500)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    heavy = 0
    for s in range(5):
        sel = weighted_sample_keys(
            df, id_col="doc_id", weight_col="w", seed=f"m{s}", k=25
        ).collect()
        heavy += sum(1 for r in sel if r["doc_id"] < 50)
    # heavy class holds 1000/1450 of total weight; expect >> uniform
    # (uniform would give ~12.5 of 125)
    assert heavy > 60


def test_deterministic_across_layout(spark):
    rows = [(i, i % 9 + 1) for i in range(300)]
    a = spark.createDataFrame(rows, ["doc_id", "w"])
    b = spark.createDataFrame(list(reversed(rows)), ["doc_id", "w"]).repartition(7)
    sel = lambda df: sorted(
        (r["doc_id"], r["score"])
        for r in weighted_sample_keys(
            df, id_col="doc_id", weight_col="w", seed="z", k=30
        ).collect()
    )
    assert sel(a) == sel(b)

# --- group_weighted_sample_keys (per-group budgeted A-ES) ---

from dedup_spark.operators.assembly import group_weighted_sample_keys


def _py_group_aes(rows, seed, k):
    by_g = {}
    for rid, g, w in rows:
        if w is None or w <= 0:
            continue
        h = int(
            hashlib.md5(f"{seed}:{rid}".encode()).hexdigest()[:15], 16
        )
        u = (h + 1) / float(1 << 60)
        by_g.setdefault(g, []).append((rid, w, math.exp(math.log(u) / w)))
    out = []
    for g, lst in by_g.items():
        lst.sort(key=lambda t: (-t[2], t[0]))
        for rank, (rid, w, s) in enumerate(lst[:k], start=1):
            out.append((g, rid, w, round(s, 6), rank))
    return sorted(out)


def test_group_matches_python_reference(spark):
    rows = [(i, f"src{i % 4}", (i * 7) % 100 + 1) for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "src", "w"])
    got = sorted(
        (r["src"], r["doc_id"], r["weight"], r["score"], r["rank"])
        for r in group_weighted_sample_keys(
            df, id_col="doc_id", group_col="src", weight_col="w",
            seed="g1", k=15,
        ).collect()
    )
    assert got == _py_group_aes(rows, "g1", 15)


def test_group_salted_equals_unsalted(spark):
    # the two-phase salted top-k must select EXACTLY the same rows as
    # the naive single-window formulation (salt_buckets=1)
    rows = [(i, f"s{i % 3}", i % 13 + 1) for i in range(600)]
    df = spark.createDataFrame(rows, ["doc_id", "src", "w"])
    pick = lambda buckets: sorted(
        tuple(r) for r in group_weighted_sample_keys(
            df, id_col="doc_id", group_col="src", weight_col="w",
            seed="sb", k=25, salt_buckets=buckets,
        ).collect()
    )
    assert pick(8) == pick(1)


def test_group_small_groups_keep_everything(spark):
    # a group with fewer than k valid rows keeps all of them, ranked
    rows = [(1, "a", 3), (2, "a", 9), (3, "b", 1), (4, "b", None)]
    df = spark.createDataFrame(rows, "doc_id long, src string, w int")
    got = group_weighted_sample_keys(
        df, id_col="doc_id", group_col="src", weight_col="w",
        seed="t", k=10,
    ).collect()
    by_g = {}
    for r in got:
        by_g.setdefault(r["src"], []).append(r["rank"])
    assert sorted(by_g["a"]) == [1, 2]
    assert by_g["b"] == [1]
