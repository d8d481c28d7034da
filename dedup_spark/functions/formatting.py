"""Cosmetic formatters — reference src/util.rs.

U1 format_number (src/util.rs:2-12): thousands separator with spaces.
U2 format_bytes  (src/util.rs:15-29): B/KB/MB/GB, base 1024, 2 decimals.
Driver-side only (report rendering), so plain Python.
"""

from __future__ import annotations

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
