"""Scan-side row filters — the reference's glob/size filter surface.

S2 build_glob_set       src/scanner.rs:13-28  → glob→regex compile (driver)
S3 matches_glob         src/scanner.rs:31-41  → full-id OR basename match
S4 exclude pruning      src/scanner.rs:59-84  → exclude wins over include
S5 include (file-level) src/scanner.rs:75-79
S6 size + empty filter  src/scanner.rs:86-109
S7 pattern-file parse   src/main.rs:95-112

All predicates are built as Catalyst Column expressions so they push
down / constant-fold; invalid patterns are warned and skipped exactly
like the reference (src/scanner.rs:19-24). Exclude precedence over
include is contract-tested (reference tests/glob_pattern.rs:337-364).
"""

from __future__ import annotations

import re
import warnings
from pathlib import Path

from pyspark.sql import Column, DataFrame, functions as F


def glob_to_regex(pattern: str) -> str | None:
    """Translate a gitignore-ish glob to an anchored regex.

    Semantics follow the reference's globset with literal_separator=true
    (src/scanner.rs:16): `*` does NOT cross `/`, `**` does, `?` is one
    non-separator char, `[...]` character classes pass through.
    Returns None (with a warning) for invalid patterns, mirroring the
    warn-and-skip behavior (src/scanner.rs:19-24).
    """
    try:
        i, out = 0, []
        while i < len(pattern):
            c = pattern[i]
            if c == "*":
                if pattern[i : i + 2] == "**":
                    out.append(".*")
                    i += 2
                    if i < len(pattern) and pattern[i] == "/":
                        i += 1  # '**/' already covered by .*
                    continue
                out.append("[^/]*")
            elif c == "?":
                out.append("[^/]")
            elif c == "[":
                j = pattern.index("]", i + 1)
                body = pattern[i + 1 : j]
                if body.startswith("!"):
                    body = "^" + body[1:]
                out.append(f"[{body}]")
                i = j
            else:
                out.append(re.escape(c))
            i += 1
        rx = "^" + "".join(out) + "$"
        re.compile(rx)
        return rx
    except (ValueError, re.error):
        warnings.warn(f"invalid glob pattern skipped: {pattern!r}", stacklevel=2)
        return None


def glob_match_predicate(id_col: Column, patterns: list[str]) -> Column | None:
    """S3: id matches the set if the FULL id or its basename matches any
    pattern (src/scanner.rs:31-41). Compiled to one alternation regex so
    Catalyst evaluates a single RLIKE per row."""
    regexes = [r for p in patterns if (r := glob_to_regex(p)) is not None]
    if not regexes:
        return None
    alt = "|".join(f"(?:{r[1:-1]})" for r in regexes)  # strip ^$, re-anchor once
    full = id_col.rlike(f"^(?:{alt})$")
    basename = F.element_at(F.split(id_col, "/"), -1).rlike(f"^(?:{alt})$")
    return full | basename


def parse_pattern_file(path: str | Path) -> list[str]:
    """S7: gitignore-style pattern file — trim, drop blanks and '#'
    comments (src/main.rs:95-112)."""
    out = []
    for line in Path(path).read_text().splitlines():
        line = line.strip()
        if line and not line.startswith("#"):
            out.append(line)
    return out


def apply_scan_filters(
    df: DataFrame,
    id_col: str = "image_id",
    payload_col: str = "bytes",
    min_size: int = 1,
    max_size: int | None = None,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
) -> DataFrame:
    """S4-S6 combined: size band + empty-row skip + include/exclude globs
    with exclude precedence. All built-in expressions → pushdown-eligible.

    Size semantics per the reference: empty rows always dropped
    (src/scanner.rs:96-99); min/max inclusive band (src/scanner.rs:100-103).
    """
    size = F.length(F.col(payload_col))
    out = df.filter(size > 0).filter(size >= min_size)
    if max_size is not None:
        out = out.filter(size <= max_size)
    inc = glob_match_predicate(F.col(id_col), include or [])
    if inc is not None:
        out = out.filter(inc)
    exc = glob_match_predicate(F.col(id_col), exclude or [])
    if exc is not None:
        out = out.filter(~exc)  # exclude wins over include (tests/glob_pattern.rs:337-364)
    return out
