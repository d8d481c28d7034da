"""URL canonicalization tests — functions/urls.py."""

from __future__ import annotations

import __spark_entry__ as entrymod
from dedup_spark.functions.urls import canonical_url
from pyspark.sql import functions as F

CASES = [
    # case + default port + fragment + tracking + param order + slash
    (
        "HTTPS://Site.COM:443/a/b/?utm_source=x&b=2&a=1&fbclid=z#frag",
        "https://site.com/a/b?a=1&b=2",
    ),
    ("http://a.com:80/x", "http://a.com/x"),
    # non-default port preserved
    ("http://a.com:8080/x", "http://a.com:8080/x"),
    # empty path -> /
    ("https://a.com", "https://a.com/"),
    # root slash kept
    ("https://a.com/", "https://a.com/"),
    # tracking-only query -> no '?'
    ("https://a.com/p?utm_campaign=c&gclid=1&ref=hn", "https://a.com/p"),
    # empty params dropped, ref= stripped only as a full key
    ("https://a.com/p?&x=1&&refresh=2", "https://a.com/p?refresh=2&x=1"),
]


def test_canonical_cases(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CASES)] + [(99, None)],
        ["i", "url"],
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonical_url(F.col("url")).alias("c")).collect()
    }
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, (i, got[i], want)
    assert got[99] is None


def test_gate_variants_collapse_per_doc(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, "t") for i in range(6)], ["doc_id", "text"]
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    rows = entrymod.q_url_dedup(spark, str(tmp_path)).collect()
    by_doc: dict[int, set] = {}
    for r in rows:
        by_doc.setdefault(r["variant_id"] // 2, set()).add(r["cluster_id"])
    # each doc's clean+dirty pair collapses to ONE cluster (the clean
    # variant id), and no two docs share a cluster
    assert all(c == {2 * d} for d, c in by_doc.items())
    canons = {r["canonical"] for r in rows}
    assert len(canons) == 6
    assert all("utm" not in c and "#" not in c and ":443" not in c
               for c in canons)
