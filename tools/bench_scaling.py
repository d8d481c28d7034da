"""Two-cluster-size scaling study (north-rule evidence).

No real cluster exists in this sandbox, and — measured in
BENCH/BASELINE.md — the sandbox's 32 "cores" are backed by a heavily
oversubscribed host whose effective CPU fluctuates minute to minute,
so raw wall-clock between local[N] and local[4N] measures the HOST,
not the engine. The study therefore reports three lines of evidence:

  1. interleaved wall-clock runs (N,4N,N,4N,...) with medians — the
     honest wall numbers, drift-compensated by interleaving;
  2. cpu-seconds per 1000 images at N vs 4N — the
     contention-independent cost: if the engine added coordination
     overhead with parallelism (the thing scaling efficiency actually
     measures), this number would GROW with cores;
  3. the host-CPU microbenchmark (sha256 thread sweep) quantifying how
     much physical parallelism the box actually has.

scaling_efficiency_cpu = cpu_per_img(N) / cpu_per_img(4N): ratio of
useful work per row — >= 0.8 means going 8->32 workers inflates
per-row cost by <= 25%, i.e. the job would scale on real executors.

Usage: python tools/bench_scaling.py [--rows 480000] [--reps 3]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import statistics
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, rows: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, "bench.py", "--only", "image_pipeline",
         "--image-rows", str(rows)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3600,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def host_cpu_sweep() -> dict[int, float]:
    data = b"x" * (1 << 20)

    def work(n: int) -> None:
        for _ in range(n):
            hashlib.sha256(data).digest()

    out = {}
    for threads in (1, 8, 32):
        per = max(1, 256 // threads)
        t0 = time.time()
        with ThreadPoolExecutor(threads) as ex:
            list(ex.map(work, [per] * threads))
        out[threads] = round(per * threads / (time.time() - t0), 1)  # MB/s
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=480_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "scaling.json"))
    args = ap.parse_args()

    sweep_before = host_cpu_sweep()
    runs: dict[int, list[dict]] = {8: [], 32: []}
    run_level(32, args.rows)  # corpus build + cache warm, untimed
    for _ in range(args.reps):  # interleave to cancel host drift
        runs[8].append(run_level(8, args.rows))
        runs[32].append(run_level(32, args.rows))
    sweep_after = host_cpu_sweep()

    def med(level: int, key: str) -> float:
        return statistics.median(r[key] for r in runs[level])

    wall8, wall32 = med(8, "value"), med(32, "value")
    cpu8 = med(8, "cpu_sec_per_kimg")
    cpu32 = med(32, "cpu_sec_per_kimg")
    result = {
        "rows": args.rows,
        "wall_sec_median": {"local8": wall8, "local32": wall32},
        "images_per_sec_median": {
            "local8": round(args.rows / wall8, 1),
            "local32": round(args.rows / wall32, 1),
        },
        "cpu_sec_per_kimg_median": {"local8": cpu8, "local32": cpu32},
        "scaling_efficiency_wall": round(wall8 / wall32 / 4.0, 3),
        "scaling_efficiency_cpu": round(cpu8 / cpu32, 3) if cpu32 else None,
        "host_sha256_mbps_by_threads": {
            "before": sweep_before, "after": sweep_after,
        },
        "runs": runs,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items() if k != "runs"}))


if __name__ == "__main__":
    main()
