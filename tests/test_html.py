"""HTML extraction tests — functions/html.py + fixtures/htmlgen.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from dedup_spark.fixtures.htmlgen import generate_html_corpus, ref_extract
from dedup_spark.functions.html import html_to_text, py_html_to_text


def test_spark_matches_parser_ground_truth(spark):
    pdf = generate_html_corpus()
    df = spark.createDataFrame(pdf, "doc_id long, html string, expected string")
    got = {
        r["doc_id"]: r["text"]
        for r in df.select(
            "doc_id", html_to_text(F.col("html")).alias("text")
        ).collect()
    }
    for _, row in pdf.iterrows():
        assert got[row["doc_id"]] == row["expected"], row["doc_id"]


def test_edge_cases():
    # fake tags inside a script body never leak
    assert py_html_to_text(
        "<script>var a='<p>leak</p>';</script><p>keep</p>"
    ) == "keep"
    assert ref_extract(
        "<script>var a='<p>leak</p>';</script><p>keep</p>"
    ) == "keep"
    # double-escape: &amp;lt; decodes ONCE to the literal string &lt;
    assert py_html_to_text("<p>&amp;lt;x&amp;gt;</p>") == "&lt;x&gt;"
    # nested/unclosed-ish markup, uppercase, self-closing
    assert py_html_to_text("<DIV><BR/>a<I>b</I></DIV>") == "a b"
    # multiline comment swallowed
    assert py_html_to_text("a<!--\nline1\nline2\n-->b") == "a b"
    # entity order: &nbsp; becomes a space, collapsed
    assert py_html_to_text("a&nbsp;&nbsp;b") == "a b"


def test_script_style_case_insensitive():
    s = "<SCRIPT>x<1</SCRIPT><Style>p{}</Style>ok"
    assert py_html_to_text(s) == "ok"
