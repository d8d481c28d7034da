"""PII detection / redaction for training-data pipelines.

Before text lands in a training corpus it gets a PII pass: count and
redact emails, bare IPv4 addresses, and phone-shaped numbers (the
BigScience/ROOTS and RefinedWeb pipelines both ship exactly this
regex-tier scrub; anything heavier — NER models — rides on top of the
same plumbing). Everything here is built-in ``regexp_count`` /
``regexp_replace`` — JVM-side, whole-stage codegen, scan speed.

Pattern portability: the engine runs Java regex, the DuckDB oracle
runs RE2. The patterns below restrict themselves to the shared
dialect — character classes, bounded repetition, alternation; no
backreferences, no lookaround (RE2 has neither) — and are pinned by
the oracle parity gate (pii_scan), the same contract as
text.SUBWORD_PATTERN.

Word boundaries: ``\\b`` means the same thing in both dialects for
these patterns (transition between [0-9A-Za-z_] and anything else).
It stops an IPv4 match from starting or ending inside an alphanumeric
run ("v10.2.3.4" doesn't match) but NOT from half-matching a longer
dotted run ("1.2.3.4.5" matches its first four octets) — excluding
that needs lookaround, which RE2 doesn't have, so the shared dialect
accepts the over-match (recall-first: the redaction is still safe).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: local-part @ domain . tld — deliberately simple (the production
#: trade-off: recall over RFC-5322 pedantry; a false positive costs a
#: redaction, a false negative leaks PII).
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"

#: dotted quad with 1-3 digit octets. No value-range check (256+ still
#: matches) — same recall-first trade-off, and keeps the pattern in
#: the shared Java/RE2 dialect.
IPV4_PATTERN = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

#: +1-555-0142-style international numbers: plus, country code,
#: dash/space-separated groups.
PHONE_PATTERN = r"\+[0-9]{1,3}[- ][0-9]{2,4}[- ][0-9]{3,6}"

REDACTION = "<PII>"


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-category match counts (email/ipv4/phone), as a dict of
    integer Columns so callers pick their aliases."""
    return {
        "emails": F.regexp_count(text, F.lit(EMAIL_PATTERN)),
        "ipv4": F.regexp_count(text, F.lit(IPV4_PATTERN)),
        "phones": F.regexp_count(text, F.lit(PHONE_PATTERN)),
    }


def redact(text: Column) -> Column:
    """Replace every PII match with ``<PII>``. Email first: an email's
    domain can contain an IPv4-shaped dotted quad, and redacting the
    whole email first makes the composition order-insensitive for the
    remaining patterns (they can't overlap each other)."""
    t = F.regexp_replace(text, EMAIL_PATTERN, REDACTION)
    t = F.regexp_replace(t, IPV4_PATTERN, REDACTION)
    return F.regexp_replace(t, PHONE_PATTERN, REDACTION)
