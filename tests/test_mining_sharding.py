"""Hard-negative band mining + output shard plan tests."""

from __future__ import annotations

import hashlib

import __spark_entry__ as e
from pyspark.sql import functions as F


def test_hard_negative_band_constructed(spark):
    # doc a/b share half their shingles (band), a/c are near-identical
    # (above band), a/d share nothing (below band)
    a = "w1 w2 w3 w4 w5 w6 w7 w8"
    b = "w1 w2 w3 w4 x5 x6 x7 x8"
    c = "w1 w2 w3 w4 w5 w6 w7 x8"
    d = "z1 z2 z3 z4 z5 z6 z7 z8"
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c), (4, d)], ["doc_id", "text"]
    )
    from dedup_spark.operators.suffix import exact_jaccard_pairs

    pairs = exact_jaccard_pairs(
        df, id_col="doc_id", text_col="text",
        threshold=e.HARD_LO, min_tokens=3, max_posting=512,
    ).filter(F.col("jaccard") < e.HARD_HI)
    got = {(r["id1"], r["id2"]) for r in pairs.collect()}
    # a-b: shingles {w1w2w3..} inter 2 of 10 => 0.2 in band
    assert (1, 2) in got
    assert (1, 3) not in got  # 5/7 ≈ 0.714 >= 0.7: a duplicate, excluded
    assert (1, 4) not in got  # zero overlap
    # band values are in [lo, hi)
    vals = [r["jaccard"] for r in pairs.collect()]
    assert all(e.HARD_LO <= v < e.HARD_HI for v in vals)


def test_hard_negative_non_vacuous_at_gate_scale(spark):
    rows = e.q_hard_negative_pairs(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) > 0
    assert all(e.HARD_LO <= r["jaccard"] < e.HARD_HI for r in rows)


def test_shard_plan_matches_python(spark):
    rows = e.q_output_shard_plan(spark, "/root/testdata/sf0.001").collect()
    assert {r["shard"] for r in rows} <= set(range(e.SHARDS))
    import duckdb

    docs = duckdb.sql(
        "SELECT doc_id, n_chars FROM '/root/testdata/sf0.001/documents.parquet'"
    ).fetchall()
    per: dict[int, list[int]] = {}
    for did, nc in docs:
        h = int(hashlib.md5(f"shard-0:{did}".encode()).hexdigest()[:15], 16)
        s = h % e.SHARDS
        agg = per.setdefault(s, [0, 0])
        agg[0] += 1
        agg[1] += nc
    tot = sum(v[1] for v in per.values())
    got = {r["shard"]: r for r in rows}
    assert set(got) == set(per)
    for s, (n, chars) in per.items():
        assert got[s]["n_docs"] == n
        assert got[s]["total_chars"] == chars
        assert got[s]["fill_factor"] == round(chars * e.SHARDS / tot, 6)
    # md5 sharding must be roughly balanced (no shard > 3x ideal)
    assert max(v[1] for v in per.values()) < 3 * tot / e.SHARDS


def test_epoch_plan_arithmetic(spark):
    rows = e.q_epoch_plan(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 20
    for r in rows:
        assert r["target_tokens"] == round(r["mix_weight"] * e.EPOCH_BUDGET, 6)
        assert abs(r["epochs"] - r["target_tokens"] / r["tokens"]) < 1e-4
        assert r["repeat_risk"] == (
            r["mix_weight"] * e.EPOCH_BUDGET / r["tokens"] > 4.0
        )
    # budget conservation: targets sum to ~the budget (weights sum ~1)
    assert abs(sum(r["target_tokens"] for r in rows) - e.EPOCH_BUDGET) < 1e3
