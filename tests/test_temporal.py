"""AS-OF and RANGE joins (operators/temporal.py): tie semantics,
no-match nulls, window-edge inclusivity, single emission per pair."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dedup_spark.operators.temporal import asof_join, range_join


def _ts(s: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture()
def sides(spark):
    left = spark.createDataFrame(
        [(1, 7, _ts(100.0)), (2, 7, _ts(50.0)), (3, 7, _ts(10.0)),
         (4, 9, _ts(100.0))],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [(7, _ts(100.0), 1.5),   # exactly at left#1's ts: ties match
         (7, _ts(40.0), 2.5),
         (8, _ts(1.0), 9.9)],    # other key: never matches
        "user_id long, ts timestamp_ntz, value double",
    )
    return left, right


def test_asof_backward_with_ties_and_nulls(spark, sides):
    left, right = sides
    out = {
        r.event_id: r
        for r in asof_join(left, right, on="user_id", right_cols=("value",))
        .collect()
    }
    assert out[1].value_matched == 1.5  # equal ts matches (<= contract)
    assert out[1].ts_matched == _ts(100.0)
    assert out[2].value_matched == 2.5  # latest preceding, not just any
    assert out[3].value_matched is None  # nothing precedes
    assert out[3].ts_matched is None
    assert out[4].value_matched is None  # key isolation
    assert len(out) == 4  # exactly one row per left row


def test_asof_matches_every_left_row_once(spark, sides):
    left, right = sides
    n = asof_join(left, right, on="user_id", right_cols=("value",)).count()
    assert n == left.count()


def test_range_join_edges_and_single_emission(spark):
    # window [l-60, l-0]; right rows planted exactly AT each edge, one
    # just outside, and one straddling a bucket boundary
    left = spark.createDataFrame(
        [(1, 5, _ts(120.0))], "event_id long, user_id long, ts timestamp_ntz"
    )
    right = spark.createDataFrame(
        [(10, 5, _ts(60.0)),    # == l-60: inclusive lower edge
         (11, 5, _ts(120.0)),   # == l: inclusive upper edge
         (12, 5, _ts(59.999999)),  # 1us outside: excluded
         (13, 5, _ts(90.0)),    # interior, different bucket than 60.0
         (14, 6, _ts(90.0))],   # other key
        "event_id long, user_id long, ts timestamp_ntz",
    )
    rows = range_join(
        left, right, on="user_id", lower_s=0, upper_s=60
    ).collect()
    got = sorted(r.r_event_id for r in rows)
    assert got == [10, 11, 13]  # each qualifying pair exactly once


def test_range_join_rejects_bad_window(spark):
    df = None
    import pyspark.sql

    with pytest.raises(ValueError):
        range_join(
            pyspark.sql.SparkSession.getActiveSession().createDataFrame(
                [], "user_id long, ts timestamp_ntz"
            ),
            pyspark.sql.SparkSession.getActiveSession().createDataFrame(
                [], "user_id long, ts timestamp_ntz"
            ),
            on="user_id",
            lower_s=10,
            upper_s=10,
        )


def test_asof_null_right_value_carries_atomically(spark):
    """A matched right row whose value is NULL must yield that NULL —
    per-column forward-fill would resurrect the older row's value,
    pairing a (ts, value) that never co-occurred (DuckDB ASOF returns
    the t=10 row with NULL value here)."""
    left = spark.createDataFrame(
        [(1, 7, _ts(20.0))], "event_id long, user_id long, ts timestamp_ntz"
    )
    right = spark.createDataFrame(
        [(7, _ts(5.0), 3.0), (7, _ts(10.0), None)],
        "user_id long, ts timestamp_ntz, value double",
    )
    row = asof_join(left, right, on="user_id", right_cols=("value",)).collect()[0]
    assert row.ts_matched == _ts(10.0)
    assert row.value_matched is None


def test_asof_equal_ts_right_duplicates_deterministic(spark):
    """Several right rows sharing (key, ts): the GREATEST payload
    struct wins (documented tie-break). Before the payload joined the
    window ordering, last() picked whichever duplicate was physically
    last — partitioning-dependent. Shuffle the input layouts and
    assert the pick never moves."""
    left = spark.createDataFrame(
        [(1, 7, _ts(20.0))], "event_id long, user_id long, ts timestamp_ntz"
    )
    dups = [(7, _ts(10.0), 1.0), (7, _ts(10.0), 9.0), (7, _ts(10.0), 4.0)]
    for perm in (dups, dups[::-1], [dups[1], dups[0], dups[2]]):
        right = spark.createDataFrame(
            perm, "user_id long, ts timestamp_ntz, value double"
        ).repartition(3)
        row = asof_join(
            left, right, on="user_id", right_cols=("value",)
        ).collect()[0]
        assert row.ts_matched == _ts(10.0)
        assert row.value_matched == 9.0


def test_conversion_funnel_nullsafe_and_recompute(spark):
    import __spark_entry__ as e
    import duckdb

    rows = {
        r["day"]: r
        for r in e.q_conversion_funnel(spark, "/root/testdata/sf0.001").collect()
    }
    ref = duckdb.sql("""
      SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n,
             sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS c,
             sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS p
      FROM '/root/testdata/sf0.001/events.parquet' GROUP BY 1
    """).fetchall()
    assert len(rows) == len(ref)
    for day, n, c, p in ref:
        r = rows[day]
        assert (r["n_events"], r["n_clicks"], r["n_purchases"]) == (n, c, p)
        if c > 0:
            assert r["conversion"] == round(p / c, 6)
        else:
            assert r["conversion"] is None


def test_cohort_retention_hand_constructed(spark):
    import __spark_entry__ as e
    from pyspark.sql import functions as F
    import datetime as dt

    # u1 active d0,d1,d2 ; u2 active d0 only ; u3 first on d1, back d2
    rows = []
    d0 = dt.datetime(2024, 1, 1)
    for uid, days in ((1, (0, 1, 2)), (2, (0,)), (3, (1, 2))):
        for k in days:
            rows.append((uid, d0 + dt.timedelta(days=k)))
            rows.append((uid, d0 + dt.timedelta(days=k, hours=3)))  # dup hit
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    import tempfile, os
    base = tempfile.mkdtemp()
    ev.write.parquet(os.path.join(base, "events.parquet"))
    got = {
        (r["cohort_day"], r["k"]): (r["n_users"], r["retention"])
        for r in e.q_cohort_retention(spark, base).collect()
    }
    assert got == {
        ("2024-01-01", 0): (2, 1.0),
        ("2024-01-01", 1): (1, 0.5),
        ("2024-01-01", 2): (1, 0.5),
        ("2024-01-02", 0): (1, 1.0),
        ("2024-01-02", 1): (1, 1.0),
    }
