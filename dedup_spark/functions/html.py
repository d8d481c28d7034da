"""HTML → text extraction — the step BEFORE every text-quality tier
when the corpus arrives as crawled markup (the C4/CCNet front door):
drop script/style/comment blocks wholesale, strip tags, decode the
common entities, collapse whitespace.

Implementation constraint that shapes everything: the chain must be a
pure built-in `regexp_replace` cascade that behaves IDENTICALLY under
Java regex (Spark, whole-stage codegen) and RE2 (DuckDB oracle) — so
no lookbehind, no backreferences; non-greedy dot-all block removal via
the (?is) inline flags both engines support. Entity decoding is the
documented common subset (lt gt quot apos #39 nbsp amp — amp LAST so
'&amp;lt;' decodes to the literal '&lt;' exactly once, the standard
double-escape rule).

This is the honest 90% of production HTML extraction (trafilatura-
class DOM scoring is a library problem, not an engine problem); the
fixture generator cross-checks the chain against Python's stdlib
html.parser on every row, so the regex shortcut is VERIFIED against a
real parser for the corpus class it claims to handle."""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# (pattern, replacement) in application order
HTML_STRIP_STEPS: tuple[tuple[str, str], ...] = (
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"<[^>]+>", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&apos;", "'"),
    (r"&#39;", "'"),
    (r"&nbsp;", " "),
    (r"&amp;", "&"),
    (r"\s+", " "),
)


def html_to_text(col: Column) -> Column:
    """Apply the strip cascade; returns trimmed single-spaced text."""
    out = col
    for pat, rep in HTML_STRIP_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(out)


def py_html_to_text(s: str) -> str:
    """Plain-Python replay of the SAME cascade (tests / generator)."""
    import re

    for pat, rep in HTML_STRIP_STEPS:
        s = re.sub(pat, rep.replace("\\", "\\\\"), s)
    return s.strip()
