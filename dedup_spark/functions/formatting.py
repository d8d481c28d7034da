"""Cosmetic formatters — reference src/util.rs.

U1 format_number (src/util.rs:2-12): thousands separator with spaces.
U2 format_bytes  (src/util.rs:15-29): B/KB/MB/GB, base 1024, 2 decimals.

Two forms each: plain Python (driver-side report rendering) and a
Spark COLUMN expression with identical output (format_number_col /
format_bytes_col) — the column form is what the driver oracle checks
(report_formatted query), and a pytest asserts the two forms agree.
Rounding note: both Java's %.2f (HALF_UP on the exact decimal
expansion) and C/DuckDB printf (half-even) agree on every reachable
double here because a true .xx5 tie requires the value (2k+1)/200,
which is not representable in binary floating point; dividing by 1024
is exponent arithmetic (exact), so sequential and single division
agree too.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_UNITS = ["B", "KB", "MB", "GB", "TB", "PB"]


def format_number(n: int) -> str:
    """Thousands separator with spaces: 1234567 -> '1 234 567'."""
    return f"{n:,}".replace(",", " ")


def format_bytes(n: int | float) -> str:
    """1024-base human units with 2 decimals: 1536 -> '1.50 KB'."""
    value = float(n)
    for unit in _UNITS:
        if value < 1024.0 or unit == _UNITS[-1]:
            if unit == "B":
                return f"{int(value)} B"
            return f"{value:.2f} {unit}"
        value /= 1024.0
    raise AssertionError("unreachable")


def format_number_col(c: Column) -> Column:
    """Column form of format_number: '1 234 567'."""
    return F.translate(F.format_number(c, 0), ",", " ")


def format_bytes_col(c: Column) -> Column:
    """Column form of format_bytes: 1536 -> '1.50 KB' (1024-base,
    2 decimals, integer-truncated B branch)."""
    v = c.cast("double")
    out = F.when(
        v < 1024.0, F.concat(v.cast("long").cast("string"), F.lit(" B"))
    )
    for i, unit in enumerate(_UNITS[1:-1], start=1):
        out = out.when(
            v < float(1024 ** (i + 1)),
            F.format_string(f"%.2f {unit}", v / float(1024**i)),
        )
    return out.otherwise(
        F.format_string(f"%.2f {_UNITS[-1]}", v / float(1024 ** (len(_UNITS) - 1)))
    )
