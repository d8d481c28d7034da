"""Snapshot diff + quantile/geometry profile tests."""

from __future__ import annotations

import __spark_entry__ as e
from dedup_spark.operators.diff import snapshot_diff


def test_snapshot_diff_hand_constructed(spark):
    old = spark.createDataFrame(
        [("a", b"x", "c1"), ("b", b"y", "c2"), ("c", b"z", "c3"),
         ("d", b"w", "c4"), ("e", b"v", "c5")],
        "image_id string, bytes binary, caption string",
    )
    new = spark.createDataFrame(
        [("a", b"x", "c1"),          # unchanged
         ("b", b"y2", "c2"),         # changed_bytes
         ("c", b"z", "c3x"),         # changed_caption
         ("d", b"w9", "c4x"),        # changed_both
         ("f", b"q", "c6")],         # added ; e removed
        "image_id string, bytes binary, caption string",
    )
    got = {r["image_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {"a": "unchanged", "b": "changed_bytes",
                   "c": "changed_caption", "d": "changed_both",
                   "e": "removed", "f": "added"}


def test_snapshot_diff_gate_covers_every_class(spark):
    counts = {}
    for r in e.q_snapshot_diff(spark, "unused").collect():
        counts[r["status"]] = counts.get(r["status"], 0) + 1
    assert set(counts) == {"added", "removed", "changed_bytes",
                           "changed_caption", "changed_both", "unchanged"}


def test_length_quantiles_match_numpy(spark):
    import duckdb
    import numpy as np

    rows = {
        r["source"]: r
        for r in e.q_length_quantiles_by_source(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    data = duckdb.sql(
        "SELECT source, n_chars FROM "
        "'/root/testdata/sf0.001/documents.parquet' WHERE n_chars IS NOT NULL"
    ).fetchall()
    per: dict[str, list[int]] = {}
    for s, n in data:
        per.setdefault(s, []).append(n)
    for s, vals in per.items():
        r = rows[s]
        assert r["n_docs"] == len(vals)
        # numpy 'linear' == type-7 == Spark percentile == quantile_cont
        for col, q in (("p10", 0.1), ("p50", 0.5), ("p90", 0.9)):
            assert r[col] == round(
                float(np.quantile(vals, q, method="linear")), 6
            ), (s, col)


def test_geometry_profile_shares_sum_to_one(spark):
    rows = e.q_image_geometry_profile(spark, "unused").collect()
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    assert sum(r["n"] for r in rows) == 400  # the pinned fixture size
