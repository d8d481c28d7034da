"""Best-copy canonical + per-source dup-rate tests."""

from __future__ import annotations

import __spark_entry__ as e


def test_best_copy_picks_highest_resolution(spark):
    rows = {
        r["image_id"]: r
        for r in e.q_best_copy_canonical(spark, "unused").collect()
    }
    # rescale corpus: 30+ sources x dims, canonical must be the #64
    # variant (the largest), never the shortest-id rule's pick
    canons = [r for r in rows.values() if r["is_canonical"]]
    assert len(canons) == len({r["cluster_id"] for r in rows.values()})
    for r in canons:
        mates = [m for m in rows.values() if m["cluster_id"] == r["cluster_id"]]
        assert r["pixels"] == max(m["pixels"] for m in mates)
    # exactly one canonical per cluster
    per = {}
    for r in rows.values():
        per[r["cluster_id"]] = per.get(r["cluster_id"], 0) + r["is_canonical"]
    assert set(per.values()) == {1}


def test_best_copy_tie_breaks_min_id(spark):
    from pyspark.sql import functions as F
    from dedup_spark.fixtures.images import _smooth_image, encode_ppm

    px = _smooth_image(b"tie", 8, 8)
    data = encode_ppm(px)
    df = spark.createDataFrame(
        [("z9", data, 8, 8, "ppm"), ("a1", data, 8, 8, "ppm")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    from dedup_spark.multimodal.decode import thumbprint_clusters

    asg = thumbprint_clusters(df)
    dims = df.select("image_id", (F.col("w").cast("long") * F.col("h")).alias("pixels"))
    j = asg.join(dims, "image_id")
    best_px = j.groupBy("cluster_id").agg(F.max("pixels").alias("_bp"))
    best = (
        j.join(best_px, "cluster_id")
        .filter(F.col("pixels") == F.col("_bp"))
        .groupBy("cluster_id")
        .agg(F.min("image_id").alias("_canon"))
    )
    got = {r["cluster_id"]: r["_canon"] for r in best.collect()}
    assert got == {"a1": "a1"}


def test_dup_rate_matches_duckdb_free_recompute(spark):
    import duckdb

    got = {
        r["source"]: (r["n_docs"], r["n_dup_docs"], r["dup_rate"])
        for r in e.q_dup_rate_by_source(spark, "/root/testdata/sf0.01").collect()
    }
    con = duckdb.connect()
    ref = con.sql("""
      WITH n AS (
        SELECT source,
               trim(regexp_replace(regexp_replace(lower("text"),
                 '[!-/:-@\\[-`{-~]', ' ', 'g'), '\\s+', ' ', 'g')) AS nt
        FROM '/root/testdata/sf0.01/documents.parquet'
      ),
      c AS (SELECT nt, count(*) AS n FROM n GROUP BY nt)
      SELECT source, count(*), sum(CASE WHEN c.n >= 2 THEN 1 ELSE 0 END),
             round(sum(CASE WHEN c.n >= 2 THEN 1 ELSE 0 END) * 1.0
                   / count(*), 6)
      FROM n JOIN c USING (nt) GROUP BY source
    """).fetchall()
    assert got == {r[0]: (r[1], r[2], r[3]) for r in ref}


def test_dup_rate_non_vacuous_at_sf01(spark):
    # sf0.01 documents happen to carry zero normalization dups (the
    # all-zero dashboard is still a value-checked answer); sf0.1 has
    # real dup groups — assert the rollup actually lights up there
    got = {
        r["source"]: r["n_dup_docs"]
        for r in e.q_dup_rate_by_source(spark, "/root/testdata/sf0.1").collect()
    }
    assert sum(got.values()) > 0
