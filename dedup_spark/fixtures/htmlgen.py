"""Deterministic crawled-HTML corpus for the extraction gate.

Five template classes exercise the failure modes that matter: plain
paragraphs; <script> blocks whose BODY contains fake tags that must
not leak; <style> + comments; entity-encoded punctuation (including
the &amp;lt; double-escape rule); uppercase/attribute-heavy/self-
closing markup. The generator computes the expected text TWICE — with
the engine's regex cascade AND with Python's stdlib html.parser
(tag-aware, entity-aware, script/style-excluding) — and ASSERTS they
agree on every row, so the regex shortcut is verified against a real
parser for exactly the corpus class the fixture claims to cover."""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd

from dedup_spark.functions.html import py_html_to_text

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango"
).split()


class _RefExtractor(HTMLParser):
    """Independent reference: stdlib parse, text nodes only,
    script/style excluded, entities decoded by the parser itself."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._skip = 0

    def handle_starttag(self, tag, attrs):
        if tag in ("script", "style"):
            self._skip += 1

    def handle_endtag(self, tag):
        if tag in ("script", "style") and self._skip:
            self._skip -= 1

    def handle_data(self, data):
        if not self._skip:
            self.parts.append(data)


def ref_extract(html: str) -> str:
    p = _RefExtractor()
    p.feed(html)
    p.close()
    return " ".join(" ".join(p.parts).split())


def _sentence(i: int, n: int = 8) -> str:
    return " ".join(_WORDS[(i * 7 + j * 3) % len(_WORDS)] for j in range(n))


def generate_html_corpus(n: int = 50, seed: int = 53) -> pd.DataFrame:
    rows = []
    for i in range(n):
        did = 10_000 + i
        s1, s2 = _sentence(i), _sentence(i + 1)
        k = i % 5
        if k == 0:
            html = f"<html><body><p>{s1}</p>\n<p>{s2}</p></body></html>"
        elif k == 1:
            html = (
                f"<html><head><script type=\"text/javascript\">\n"
                f"var x = '<p>not {i} text</p>'; if (x < {i}) alert(x);\n"
                f"</script></head><body><div>{s1}</div></body></html>"
            )
        elif k == 2:
            html = (
                f"<html><head><style>p {{color: red}}</style></head>"
                f"<body><!-- hidden {i} comment --><p>{s1}</p></body></html>"
            )
        elif k == 3:
            html = (
                f"<html><body><p>{s1} &amp; {s2}</p>"
                f"<p>x &lt; y &gt; z &quot;q&quot; &#39;a&#39;&nbsp;end"
                f" &amp;lt;literal&amp;gt;</p></body></html>"
            )
        else:
            html = (
                f"<HTML><BODY CLASS=\"main\"><P ID=\"p{i}\">{s1}</P>"
                f"<BR/><A HREF=\"/x?a={i}&amp;b=2\">{s2}</A></BODY></HTML>"
            )
        regex_text = py_html_to_text(html)
        parser_text = ref_extract(html)
        assert regex_text == parser_text, (
            f"doc {did} class {k}: regex cascade and stdlib parser "
            f"disagree:\n  regex : {regex_text!r}\n  parser: {parser_text!r}"
        )
        rows.append((did, html, regex_text))
    return pd.DataFrame(rows, columns=["doc_id", "html", "expected"])
