"""URL canonicalization — normalize-then-hash dedup for web corpora.

Every web-crawl pipeline dedups by canonical URL before touching
content (the same page arrives as `HTTPS://Site.COM:443/a/?utm_...#x`
and `https://site.com/a?...` across crawls; CommonCrawl index keys,
C4's and RefinedWeb's URL dedup). The canonical form used here is the
widely-published recipe:

  * scheme and host lowercased;
  * default port stripped (`:443` for https, `:80` for http) — other
    ports preserved;
  * fragment dropped;
  * tracking parameters dropped (`utm_*` prefix and the `fbclid`,
    `gclid`, `ref` keys);
  * remaining query parameters SORTED (order never distinguishes
    resources in practice), empty params dropped;
  * empty path becomes `/`; a trailing slash on a non-root path is
    stripped.

Engine side uses Spark's built-in `parse_url` (Java URI parsing —
JVM, codegen-friendly, no UDF) for the part extraction and pure array
expressions for the query rewrite. The DuckDB oracle re-derives every
part with REGEXES instead — two independent parsers must produce the
identical canonical string, the same cross-implementation posture as
the NFC tier (stdlib unicodedata vs ICU).

Scale shape: a per-row projection (no shuffle at all); the dedup that
follows is the standard md5-keyed groupBy. Deliberate subset, stated:
userinfo (`user:pass@`) and percent-encoding normalization are out of
scope — the synthesized gate corpus contains neither, and a real
crawl canonicalizer would add RFC 3986 percent-decoding of unreserved
characters in the same projection shape.

Reference parity: [EXT] LLM-pipeline surface (SURVEY.md §2.4); no
reference counterpart (the reference dedups file bytes; this is the
crawl-identity tier upstream of it).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

TRACKING_KEY_RE = r"^(utm_[^=]*|fbclid|gclid|ref)="


def canonical_url(col: Column) -> Column:
    """Canonical form of a URL column (null in, null out)."""
    scheme = F.lower(F.parse_url(col, F.lit("PROTOCOL")))
    auth = F.lower(F.parse_url(col, F.lit("AUTHORITY")))
    hostport = (
        F.when(scheme == "https", F.regexp_replace(auth, r":443$", ""))
        .when(scheme == "http", F.regexp_replace(auth, r":80$", ""))
        .otherwise(auth)
    )
    rawpath = F.coalesce(F.parse_url(col, F.lit("PATH")), F.lit(""))
    path = F.when(rawpath == "", F.lit("/")).otherwise(
        F.when(
            F.length(rawpath) > 1, F.regexp_replace(rawpath, r"/$", "")
        ).otherwise(rawpath)
    )
    q = F.coalesce(F.parse_url(col, F.lit("QUERY")), F.lit(""))
    kept = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda x: (x != "") & ~x.rlike(TRACKING_KEY_RE),
        )
    )
    qs = F.array_join(kept, "&")
    return F.when(
        col.isNotNull(),
        F.concat(
            scheme,
            F.lit("://"),
            hostport,
            path,
            F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
        ),
    )
