"""Salted-aggregation tests: results identical to unsalted, hot keys
spread across salt buckets."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from dedup_spark.config import DedupConfig
from dedup_spark.operators.salting import salted_collect_set, salted_count, with_salt


def _df(spark):
    rows = [("hot", f"m{i:04d}") for i in range(500)] + [
        ("cold1", "a"), ("cold1", "b"), ("cold2", "z")
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["k", "v"]))


def test_salted_collect_set_matches_plain(spark):
    df = _df(spark)
    cfg = DedupConfig(salt_buckets=8)
    got = {
        r["k"]: list(r["members"])
        for r in salted_collect_set(df, ["k"], "v", cfg).collect()
    }
    want = {
        r["k"]: sorted(r["m"])
        for r in df.groupBy("k").agg(F.collect_set("v").alias("m")).collect()
    }
    assert got == want
    assert len(got["hot"]) == 500


def test_salted_count_matches_plain(spark):
    df = _df(spark)
    got = {r["k"]: r["n"] for r in salted_count(df, ["k"]).collect()}
    assert got == {"hot": 500, "cold1": 2, "cold2": 1}


def test_salt_spreads_hot_key(spark):
    df = _df(spark).filter(F.col("k") == "hot")
    n_buckets = (
        with_salt(df, 8).select("_salt").distinct().count()
    )
    assert n_buckets >= 4  # 500 rows over 8 buckets: all hit w.h.p.


def test_salt_is_deterministic_across_runs(spark):
    """Retry semantics: salt must be a pure function of row content so a
    re-executed task reproduces the exact row→bucket assignment."""
    df = _df(spark)
    a = {(r["k"], r["v"]): r["_salt"] for r in with_salt(df, 8).collect()}
    b = {(r["k"], r["v"]): r["_salt"] for r in with_salt(_df(spark), 8).collect()}
    assert a == b
    # and restricting the salt input to a subset of columns also holds
    c = {(r["k"], r["v"]): r["_salt"] for r in with_salt(df, 8, salt_on=["v"]).collect()}
    d = {(r["k"], r["v"]): r["_salt"] for r in with_salt(_df(spark), 8, salt_on=["v"]).collect()}
    assert c == d
