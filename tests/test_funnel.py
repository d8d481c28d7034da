"""Dedup funnel dashboard tests."""

from __future__ import annotations

import __spark_entry__ as e


def test_funnel_invariants(spark):
    row = e.q_dedup_funnel(spark, "unused").collect()[0]
    # the union can never be smaller than any single tier
    assert row["n_union_pairs"] >= max(
        row["n_exact_pairs"], row["n_caption_pairs"], row["n_phash_pairs"]
    )
    # exact dups share phash (radius 0 <= 3): the exact tier is
    # contained in the phash tier on this corpus, so the union equals
    # the phash pair count here
    assert row["n_union_pairs"] == row["n_phash_pairs"]
    # cluster accounting: duplicates need >= 2 rows per cluster; the
    # fixture is 400 rows
    assert row["n_rows"] == 400
    assert row["n_dup_rows"] >= 2 * row["n_clusters"]
    assert row["n_dup_rows"] <= row["n_rows"]
    # pinned fixture numbers (seed 42 corpus — drift means the corpus
    # or a tier changed, which must be a deliberate commit)
    assert (
        row["n_exact_pairs"],
        row["n_caption_pairs"],
        row["n_phash_pairs"],
        row["n_clusters"],
        row["n_dup_rows"],
    ) == (198, 198, 307, 98, 269)
