"""Like-for-like exact-only throughput cells vs the reference benchmark.

The reference's headline number (BASELINE.md: 28,224 files/s peak,
10 GiB corpus, exact-only dedup = scan -> size grouping -> partial hash
-> full hash -> duplicate groups + stats; reference src/scanner.rs,
src/grouping.rs, src/output.rs, timed by benchmark/runner.py) measures
strictly LESS work per row than our flagship `image_pipeline` (which
adds the phash near-dup tier and transitive clustering). This tool
measures the apples-to-apples cells: the SAME exact-only work on our
960k-row / ~17 GB image corpus, in two shapes:

  exact_pipeline        our production stage-1 (metadata keys
                        phash/w/h/fmt, fused full hash — 2 payload
                        passes total, key pass metadata-only)
  exact_pipeline_3pass  reference-FAITHFUL shape (length-only stage-1
                        key, size -> 8 KiB prefix hash -> full hash)

Each is measured two ways:
  - unpinned local[32] (upper bound on this box)
  - under an 8-core cgroup CFS quota (tools/bench_cgroup.py
    methodology: kernel caps total cpu-time at 8 cores while
    scheduling around per-core host noise; JVM GC/JIT pools sized to
    the quota) — the faithful 8-core-executor emulation, directly
    comparable to the pinned-8-CPU flagship cells in BASELINE.md §4.

Usage: sudo python tools/bench_exact_tier.py [--rows 960000] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from bench_cgroup import QuotaGroup, host_cpu_sweep, run_level  # noqa: E402

JOBS = ("exact_pipeline", "exact_pipeline_3pass")
REFERENCE_PEAK_FILES_PER_SEC = 28_224  # reference BASELINE.md best cell


def run_unpinned(rows: int, job: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS="32")
    out = subprocess.run(
        [sys.executable, "bench.py", "--only", job, "--image-rows", str(rows)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=5400,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    raise RuntimeError(
        f"bench.py (unpinned, job={job}) produced no JSON line; "
        f"stderr tail: {out.stderr[-400:]!r}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=960_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--quota", type=int, default=8)
    ap.add_argument(
        "--out", default=os.path.join(REPO, "BENCH", "exact_tier.json")
    )
    args = ap.parse_args()

    sweep_before = host_cpu_sweep()
    # corpus build + page-cache warm, untimed
    run_unpinned(args.rows, JOBS[0])

    group = QuotaGroup("dedup_exact_tier", args.quota)
    cells: dict[str, dict] = {}
    try:
        for job in JOBS:
            unp = [run_unpinned(args.rows, job) for _ in range(args.reps)]
            quo = [run_level(group, args.rows, job) for _ in range(args.reps)]

            def med(reps: list[dict], key: str) -> float:
                return statistics.median(r[key] for r in reps)

            cells[job] = {
                "unpinned_local32": {
                    "wall_sec_median": med(unp, "value"),
                    "images_per_sec_median": round(
                        args.rows / med(unp, "value"), 1
                    ),
                    "cpu_sec_per_kimg_median": med(unp, "cpu_sec_per_kimg"),
                    "reps": unp,
                },
                f"cgroup_quota_{args.quota}cpu": {
                    "wall_sec_median": med(quo, "value"),
                    "images_per_sec_median": round(
                        args.rows / med(quo, "value"), 1
                    ),
                    "cpu_sec_per_kimg_median": med(quo, "cpu_sec_per_kimg"),
                    "reps": quo,
                },
            }
    finally:
        group.destroy()
    sweep_after = host_cpu_sweep()

    result = {
        "rows": args.rows,
        "reference_peak_files_per_sec": REFERENCE_PEAK_FILES_PER_SEC,
        "reference_cell": "fast-disk / small-heavy / 10% dups / 10 GiB, "
                          "exact-only (reference BASELINE.md)",
        "cells": cells,
        "vs_reference_peak": {
            job: {
                mode: round(
                    cells[job][mode]["images_per_sec_median"]
                    / REFERENCE_PEAK_FILES_PER_SEC, 2,
                )
                for mode in cells[job]
            }
            for job in cells
        },
        "host_sha256_mbps_by_threads": {
            "before": sweep_before, "after": sweep_after,
        },
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(
        {k: v for k, v in result.items() if k != "cells"}
        | {"vs_reference_peak": result["vs_reference_peak"]}
    ))


if __name__ == "__main__":
    main()
