#!/usr/bin/env python
"""spark-submit entry point for the text-side corpus→training-mixture
pipeline (the companion of jobs/dedup_job.py, which covers the
image+caption dedup surface):

    spark-submit --py-files dedup_spark.zip jobs/mixture_job.py \
        --input /data/documents --output /data/mixture \
        --budget 4096 --seed run-17 \
        --rates high=1.0,mid=0.5,low=0.1

Stages (each skippable):
  1. near-dup clustering (exact-Jaccard inverted index → CC) and
     highest-quality-per-cluster selection        [--no-dedup]
  2. deterministic quality-stratified sampling    [--rates]
  3. concat-and-chunk sequence packing            [--budget]
plus a per-source token/mixing-weight summary written alongside
(`<output>/source_mixing`).

The composed plan is the same code path the driver gates as the
``training_mixture`` query — this file only parses flags and writes.

Packaging: `cd /root/repo && zip -r dedup_spark.zip dedup_spark`,
pass via --py-files; this file imports ONLY from the package.
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_rates(spec: str) -> dict[str, float]:
    out = {}
    for part in spec.split(","):
        k, v = part.split("=")
        out[k.strip()] = float(v)
    return out


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="dedup → quality-keep → sample → pack a documents table"
    )
    p.add_argument("--input", required=True, help="documents parquet dir")
    p.add_argument("--output", required=True, help="output dir (mixture + source_mixing)")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--source-col", default="source")
    p.add_argument("--no-dedup", action="store_true",
                   help="skip near-dup keep (sample+pack the full corpus)")
    p.add_argument("--jaccard", type=float, default=0.7)
    p.add_argument("--rates", default="high=1.0,mid=0.5,low=0.1",
                   help="per-quality-bucket keep rates")
    p.add_argument("--high", type=float, default=0.8, help="quality >= this → high")
    p.add_argument("--mid", type=float, default=0.7, help="quality >= this → mid")
    p.add_argument("--budget", type=int, default=4096, help="tokens per training block")
    p.add_argument("--alpha", type=float, default=0.5, help="mixing temperature")
    p.add_argument("--seed", default="seed-0")
    p.add_argument("--jobs", type=int, default=None, help="local-mode cores")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)

    from pyspark.sql import SparkSession, functions as F

    from dedup_spark.functions import text as TX
    from dedup_spark.operators.assembly import (
        pack_sequences,
        source_mixing_weights,
        stratified_sample,
    )
    from dedup_spark.operators.components import clusters_from_pairs
    from dedup_spark.operators.suffix import exact_jaccard_pairs

    if args.jobs:
        from dedup_spark.session import get_spark

        spark = get_spark("mixture_job", cores=args.jobs)
    else:
        spark = SparkSession.builder.appName("mixture_job").getOrCreate()

    docs = spark.read.parquet(args.input)
    idc, txt = args.id_col, F.col(args.text_col)
    scored = docs.withColumn("quality", TX.quality_score(txt))

    if not args.no_dedup:
        edges = exact_jaccard_pairs(
            docs, id_col=idc, text_col=args.text_col, threshold=args.jaccard
        ).select("id1", "id2")
        assign = clusters_from_pairs(edges, all_ids=docs, id_col=idc)
        j = assign.join(scored.select(idc, "quality"), on=idc)
        best = j.groupBy("cluster_id").agg(
            F.min_by(
                idc, F.struct((-F.col("quality")).alias("nq"), F.col(idc))
            ).alias("_keep_id")
        )
        keep_ids = best.select(F.col("_keep_id").alias(idc))
        scored = scored.join(keep_ids, on=idc, how="left_semi")

    bucketed = scored.withColumn(
        "bucket",
        F.when(F.col("quality") >= args.high, F.lit("high"))
        .when(F.col("quality") >= args.mid, F.lit("mid"))
        .otherwise(F.lit("low")),
    )
    sampled = stratified_sample(
        bucketed,
        stratum_col="bucket",
        rates=parse_rates(args.rates),
        id_col=idc,
        seed=f"{args.seed}:sample",
    ).filter(F.col("sampled"))

    packed = pack_sequences(
        sampled.withColumn("toks", TX.token_count(txt)),
        token_col="toks",
        budget=args.budget,
        id_col=idc,
        seed=args.seed,
    )
    mixture = packed.select(
        idc, "quality", "bucket", F.col("toks").cast("long").alias("toks"),
        "token_offset", "block_start", "block_end", "n_blocks",
    )
    mixture.write.mode("overwrite").parquet(f"{args.output}/mixture")

    mix = source_mixing_weights(
        sampled, source_col=args.source_col,
        token_count=TX.token_count(txt), alpha=args.alpha,
    )
    mix.write.mode("overwrite").parquet(f"{args.output}/source_mixing")

    n_docs = spark.read.parquet(f"{args.output}/mixture").count()
    tot = spark.read.parquet(f"{args.output}/source_mixing").agg(
        F.sum("tokens")
    ).first()[0]
    blocks = (int(tot) + args.budget - 1) // args.budget if tot else 0
    print(json.dumps({
        "docs_packed": n_docs, "total_tokens": int(tot or 0),
        "budget": args.budget, "training_blocks": blocks,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
