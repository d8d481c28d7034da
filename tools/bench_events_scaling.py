#!/usr/bin/env python
"""Events-table scaling study: the round-4 temporal/OLAP tiers
(as-of join, range join, rollup cascade, JSON extraction) at 10x the
sf0.1 events row count.

The 10x corpus is derived deterministically from sf0.1 events: 10
replicas with event_id offset by 10^9 and user_id offset by 10^6 per
replica — PER-USER event density is unchanged, so the per-key window
sorts (as-of) and bucket joins (range) see the same key-local work and
total work should scale linearly with rows; a superlinear cpu ratio
would mean key-local state is leaking across the corpus.

Both sides run against equal-layout 32-partition restages (the
bench_sf1 lesson: a 1-vs-32-partition layout difference charges the
big side with worker startup the small side never pays).

Usage: python tools/bench_events_scaling.py [--reps N]
Writes BENCH/events_scaling.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = "/root/testdata/sf0.1"
BASE32_DIR = "/tmp/dedup_spark_bench/events_base32"
X10_DIR = "/tmp/dedup_spark_bench/events_x10"
REPLICAS = 10

QUERIES = [
    "events_asof_join",
    "events_range_join",
    "events_rollup",
    "events_props_extract",
]


def build(spark) -> None:
    from pyspark.sql import functions as F

    for out_root, reps in ((BASE32_DIR, 1), (X10_DIR, REPLICAS)):
        out = os.path.join(out_root, "events.parquet")
        if not os.path.exists(os.path.join(out, "_SUCCESS")):
            ev = spark.read.parquet(os.path.join(BASE_SF, "events.parquet"))
            parts = []
            for r in range(reps):
                parts.append(
                    ev.withColumn(
                        "event_id",
                        (F.col("event_id") + F.lit(r * 1_000_000_000)).cast(
                            "long"
                        ),
                    ).withColumn(
                        "user_id",
                        (F.col("user_id") + F.lit(r * 1_000_000)).cast("long"),
                    )
                )
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
            df.repartition(32).write.mode("overwrite").parquet(out)
        for name in os.listdir(BASE_SF):
            dst = os.path.join(out_root, name)
            if name != "events.parquet" and not os.path.exists(dst):
                os.symlink(os.path.join(BASE_SF, name), dst)


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_suite(sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    p = subprocess.run(
        [sys.executable, "bench.py", "--only", ",".join(QUERIES)],
        env=env, capture_output=True, text=True, cwd=REPO,
    )
    lines = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
    if p.returncode != 0 or not lines:
        raise RuntimeError(
            f"bench.py failed (rc={p.returncode}) for {sf_dir}:\n"
            + p.stderr[-3000:]
        )
    return json.loads(lines[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from dedup_spark.session import get_spark

    spark = get_spark("events_scale_build")
    build(spark)
    spark.stop()

    import statistics

    base_runs, x10_runs = [], []
    for _ in range(args.reps):
        base_runs.append(run_suite(BASE32_DIR))
        x10_runs.append(run_suite(X10_DIR))

    report = {
        "metric": "events_scaling",
        "replicas": REPLICAS,
        "row_ratio": float(REPLICAS),
        "queries": {},
    }
    for q in QUERIES:
        b_cpu = statistics.median(r["cpu_sec"][q] for r in base_runs)
        x_cpu = statistics.median(r["cpu_sec"][q] for r in x10_runs)
        report["queries"][q] = {
            "base_wall": statistics.median(r["queries"][q] for r in base_runs),
            "x10_wall": statistics.median(r["queries"][q] for r in x10_runs),
            "base_cpu": round(b_cpu, 2),
            "x10_cpu": round(x_cpu, 2),
            "cpu_ratio": round(x_cpu / b_cpu, 2) if b_cpu else None,
        }
    ratios = [
        v["cpu_ratio"] for v in report["queries"].values() if v["cpu_ratio"]
    ]
    report["max_cpu_ratio"] = max(ratios)
    # 1.5x noise margin over the row-linear baseline (host contention)
    report["superlinear"] = [
        q for q, v in report["queries"].items()
        if (v["cpu_ratio"] or 0) > 1.5 * REPLICAS
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "events_scaling.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
