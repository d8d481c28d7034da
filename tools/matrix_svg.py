"""Render BENCH/matrix.json as an SVG heatmap — the reference's
matplotlib heatmaps (benchmark/plotting.py) re-created without any
plotting dependency (this container has no matplotlib; SVG is plain
text). Deterministic output: same JSON → same SVG bytes.

Usage: python tools/matrix_svg.py   (after tools/bench_matrix.py)
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROFILES = ["small-heavy", "mixed", "large-heavy"]
DUPS = [0.1, 0.3, 0.6]

CELL_W, CELL_H, PAD_L, PAD_T, GAP = 110, 56, 120, 70, 36


def _color(v: float, lo: float, hi: float) -> str:
    """Two-stop sequential ramp (light → saturated blue)."""
    t = 0.0 if hi == lo else (v - lo) / (hi - lo)
    r = int(237 + t * (33 - 237))
    g = int(248 + t * (113 - 248))
    b = int(251 + t * (181 - 251))
    return f"rgb({r},{g},{b})"


def _grid(cells, key, title, fmt, y0):
    vals = [c[key] for c in cells]
    lo, hi = min(vals), max(vals)
    out = [
        f'<text x="{PAD_L}" y="{y0 - 28}" font-size="15" font-weight="bold" '
        f'fill="#222">{title}</text>'
    ]
    for j, d in enumerate(DUPS):
        out.append(
            f'<text x="{PAD_L + j * CELL_W + CELL_W / 2}" y="{y0 - 8}" '
            f'font-size="12" text-anchor="middle" fill="#555">dup {d}</text>'
        )
    for i, p in enumerate(PROFILES):
        out.append(
            f'<text x="{PAD_L - 8}" y="{y0 + i * CELL_H + CELL_H / 2 + 4}" '
            f'font-size="12" text-anchor="end" fill="#555">{p}</text>'
        )
        for j, d in enumerate(DUPS):
            c = next(
                x for x in cells if x["profile"] == p and x["dup_ratio"] == d
            )
            x, y = PAD_L + j * CELL_W, y0 + i * CELL_H
            dark = (c[key] - lo) / (hi - lo) if hi != lo else 0
            fg = "#fff" if dark > 0.6 else "#1a1a1a"
            out.append(
                f'<rect x="{x}" y="{y}" width="{CELL_W - 2}" height="{CELL_H - 2}" '
                f'fill="{_color(c[key], lo, hi)}" rx="3"/>'
                f'<text x="{x + CELL_W / 2 - 1}" y="{y + CELL_H / 2 + 4}" '
                f'font-size="13" text-anchor="middle" fill="{fg}">'
                f"{fmt.format(c[key])}</text>"
            )
    return out, y0 + len(PROFILES) * CELL_H


def main() -> None:
    with open(os.path.join(REPO, "BENCH", "matrix.json")) as f:
        data = json.load(f)
    cells = data["cells"]
    body = []
    y = PAD_T
    for key, title, fmt in [
        ("accuracy", "exact-dedup accuracy (%) — ground-truth assignment match", "{:.1f}"),
        ("images_per_sec", "throughput (images/sec)", "{:.0f}"),
        ("wall_sec", "wall seconds", "{:.2f}"),
    ]:
        grid, y = _grid(cells, key, title, fmt, y + GAP)
        body += grid
        y += 10
    w = PAD_L + len(DUPS) * CELL_W + 30
    svg = (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{w}" height="{y + 20}" '
        f'font-family="system-ui, sans-serif">'
        f'<rect width="{w}" height="{y + 20}" fill="#fff"/>'
        f'<text x="{PAD_L}" y="28" font-size="17" font-weight="bold" fill="#111">'
        f'dedup_spark matrix benchmark — {data["rows_per_cell"]} images/cell, '
        f'local[{data["cpus"]}]</text>' + "".join(body) + "</svg>"
    )
    out = os.path.join(REPO, "BENCH", "matrix.svg")
    with open(out, "w") as f:
        f.write(svg)
    print(f"wrote {out} ({len(svg)} bytes)")


if __name__ == "__main__":
    main()
