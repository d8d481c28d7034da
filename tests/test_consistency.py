"""Caption↔image consistency audit tests — multimodal/consistency.py."""

from __future__ import annotations

from dedup_spark.fixtures.images import generate_caption_audit_corpus
from dedup_spark.multimodal.consistency import caption_image_consistency


def _run(spark):
    pdf = generate_caption_audit_corpus()
    df = spark.createDataFrame(
        pdf, "image_id string, bytes binary, caption string, klass string"
    )
    out = {
        r["image_id"]: r
        for r in caption_image_consistency(df.drop("klass")).collect()
    }
    return pdf, out


def test_matches_pandas_recompute(spark):
    pdf, out = _run(spark)
    n_cap = pdf.groupby(pdf["bytes"].apply(bytes))["caption"].transform(
        "nunique"
    )
    n_img = pdf.groupby("caption")["bytes"].transform(
        lambda s: s.apply(bytes).nunique()
    )
    for i, row in pdf.iterrows():
        r = out[row["image_id"]]
        assert r["n_captions"] == n_cap[i], row["image_id"]
        assert r["n_images"] == n_img[i], row["image_id"]


def test_class_statuses(spark):
    pdf, out = _run(spark)
    by_klass: dict[str, set] = {}
    for _, row in pdf.iterrows():
        by_klass.setdefault(row["klass"], set()).add(
            out[row["image_id"]]["status"]
        )
    assert by_klass["single"] == {"consistent"}
    # exact duplication is NOT label noise: same bytes + same caption
    assert by_klass["exact_dup"] == {"consistent"}
    assert by_klass["conflict"] == {"caption_conflict"}
    assert by_klass["stock"] == {"stock_caption"}
    # the mixed group: statuses differ by which side a row sits on
    assert by_klass["both"] == {"both", "caption_conflict", "stock_caption"}


def test_report_is_total_with_null_rows(spark):
    rows = [("a", b"x", "c"), ("b", None, "c"), ("c", b"y", None)]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, caption string"
    )
    got = {r["image_id"]: r for r in caption_image_consistency(df).collect()}
    assert set(got) == {"a", "b", "c"}  # every row appears exactly once
    assert got["b"]["status"] == got["c"]["status"] == "incomplete"
    assert got["b"]["n_captions"] == 0 and got["c"]["n_images"] == 0
