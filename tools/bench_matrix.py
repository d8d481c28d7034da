"""Matrix benchmark: 3 size profiles × 3 dup ratios, with a per-cell
accuracy oracle — parity with the reference's matrix runner + accuracy
check (benchmark/runner.py:181-209, 221-271; benchmark/config.py:8-23).

Each cell: generate a deterministic corpus (cached as parquet), run the
exact-dedup pipeline end-to-end, compare the found duplicate pairs to
the generator's ground truth (accuracy must be 100.0 — the reference
reports the same on all 9 cells), and record throughput.

Output: BENCH/matrix.json + BENCH/matrix.md (markdown heatmap tables —
this container has no matplotlib; the tables carry the same content as
the reference's bar/heatmap PNGs). If matplotlib IS available, a PNG
heatmap is rendered too.

Usage: python tools/bench_matrix.py [--rows 8000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PROFILES = ["small-heavy", "mixed", "large-heavy"]
DUP_RATIOS = [0.1, 0.3, 0.6]


def cell_corpus(spark, profile: str, dup_ratio: float, rows: int) -> tuple[str, str]:
    """Generate (and cache) one cell's corpus + truth parquet."""
    tag = f"matrix_{profile}_d{int(dup_ratio * 100)}_n{rows}"
    base = f"/tmp/dedup_spark_bench/{tag}"
    if not os.path.exists(os.path.join(base, "images", "_SUCCESS")):
        from dedup_spark.fixtures.images import generate_corpus, to_spark

        corpus = generate_corpus(rows, dup_ratio=dup_ratio, profile=profile, seed=42)
        imgs, truth = to_spark(spark, corpus)
        imgs.repartition(16).write.mode("overwrite").parquet(f"{base}/images")
        truth.write.mode("overwrite").parquet(f"{base}/truth")
    return f"{base}/images", f"{base}/truth"


def run_cell(spark, profile: str, dup_ratio: float, rows: int) -> dict:
    from pyspark.sql import functions as F

    from dedup_spark.operators.exact import exact_duplicate_clusters

    img_path, truth_path = cell_corpus(spark, profile, dup_ratio, rows)
    df = spark.read.parquet(img_path)
    # warmup, then timed
    exact_duplicate_clusters(df).write.format("noop").mode("overwrite").save()
    t0 = time.time()
    asg = exact_duplicate_clusters(df)
    asg.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0

    # accuracy oracle vs generator ground truth (distributed compare:
    # canonicalize both sides to (member, min-member-of-cluster))
    truth = spark.read.parquet(truth_path)
    # ground-truth EXACT clusters = truth clusters restricted to rows
    # whose bytes equal their cluster original's bytes (near-dups are
    # in the truth table but must NOT be found by the exact tier)
    bytes_of = df.select(
        F.col("image_id").alias("tid"), F.sha2("bytes", 256).alias("sha")
    )
    t = (
        truth.join(bytes_of, truth.image_id == bytes_of.tid)
        .select("image_id", "cluster_id", "sha")
    )
    want = (
        t.groupBy("cluster_id", "sha")
        .agg(F.count(F.lit(1)).alias("n"), F.min("image_id").alias("root"))
        .filter(F.col("n") >= 2)
        .join(t, on=["cluster_id", "sha"])
        .select("image_id", "root")
    )
    got = asg.select("image_id", F.col("cluster_id").alias("root"))
    missed = want.join(got, on=["image_id", "root"], how="left_anti").count()
    extra = got.join(want, on=["image_id", "root"], how="left_anti").count()
    want_n = want.count()
    acc = 100.0 * (1 - (missed + extra) / max(want_n, 1))
    return {
        "profile": profile,
        "dup_ratio": dup_ratio,
        "rows": rows,
        "wall_sec": round(wall, 3),
        "images_per_sec": round(rows / wall, 1),
        "dup_rows_expected": want_n,
        "missed": missed,
        "extra": extra,
        "accuracy": round(acc, 1),
    }


def heat_md(cells: list[dict], key: str, fmt: str = "{:.1f}") -> str:
    out = ["| profile \\ dup | " + " | ".join(str(d) for d in DUP_RATIOS) + " |",
           "|---|" + "---|" * len(DUP_RATIOS)]
    for p in PROFILES:
        row = [p]
        for d in DUP_RATIOS:
            c = next(x for x in cells if x["profile"] == p and x["dup_ratio"] == d)
            row.append(fmt.format(c[key]))
        out.append("| " + " | ".join(row) + " |")
    return "\n".join(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8000)
    args = ap.parse_args()

    from dedup_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench_matrix", cores=cpus)
    cells = [
        run_cell(spark, p, d, args.rows) for p in PROFILES for d in DUP_RATIOS
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "matrix.json"), "w") as f:
        json.dump({"rows_per_cell": args.rows, "cpus": cpus, "cells": cells}, f, indent=2)

    md = [
        "# Matrix benchmark — 3 size profiles × 3 dup ratios",
        "",
        f"{args.rows} images/cell, exact-dedup pipeline, `local[{cpus}]` "
        "(reference: benchmark/runner.py matrix — its 9 cells all report "
        "accuracy 100.0; so must ours).",
        "",
        "## accuracy (% of ground-truth duplicate assignments matched, "
        "penalizing misses AND false positives)",
        "",
        heat_md(cells, "accuracy"),
        "",
        "## throughput (images/sec)",
        "",
        heat_md(cells, "images_per_sec", "{:.0f}"),
        "",
        "## wall seconds",
        "",
        heat_md(cells, "wall_sec", "{:.2f}"),
    ]
    try:  # optional PNG heatmap when matplotlib exists
        import matplotlib  # noqa: F401

        from tools._matrix_plot import render  # pragma: no cover

        render(cells)
    except Exception:
        md.append("\n*(matplotlib unavailable — run `python tools/matrix_svg.py` "
                  "for the dependency-free SVG heatmaps in `BENCH/matrix.svg`)*")
    with open(os.path.join(REPO, "BENCH", "matrix.md"), "w") as f:
        f.write("\n".join(md) + "\n")
    bad = [c for c in cells if c["accuracy"] < 100.0]
    print(json.dumps({"cells": len(cells), "all_accurate": not bad}))
    if bad:
        print(json.dumps(bad, indent=2))
        raise SystemExit(1)


if __name__ == "__main__":
    main()
