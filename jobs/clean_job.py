#!/usr/bin/env python
"""spark-submit entry point for corpus CLEANING — the sub-document
tiers added in round 4, composed as one pass:

    spark-submit --py-files dedup_spark.zip jobs/clean_job.py \
        --input /data/documents --output /data/cleaned \
        --span-k 13 --max-dup-fraction 0.5

Stages:
  1. exact duplicated-span EXCISION (operators/spandedup.py, the
     ExactSubstr recipe): cross-doc verbatim spans >= span-k words are
     cut out of every carrier; docs whose covered fraction exceeds
     --max-dup-fraction are DROPPED instead of trimmed (a mostly-
     duplicated doc is noise, not signal)            [--no-excise]
  2. decontamination (operators/decontaminate.py): docs sharing a
     word-13-gram with the --eval-set table are dropped  [--eval-set]

Writes the cleaned documents table (original columns, text replaced
by cleaned_text) plus a one-row JSON report (`<output>_report`):
docs in/out, words excised, contaminated drops.

The excision/decontamination code paths are the same ones the driver
gates as ``exact_span_dedup`` / ``decontaminate`` — this file only
parses flags, composes, and writes.

Packaging: `cd /root/repo && zip -r dedup_spark.zip dedup_spark`,
pass via --py-files; this file imports ONLY from the package.
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="span-excise + decontaminate a documents table"
    )
    p.add_argument("--input", required=True, help="documents parquet dir")
    p.add_argument("--output", required=True, help="cleaned parquet dir")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--span-k", type=int, default=13,
                   help="word-gram width for span excision")
    p.add_argument("--max-dup-fraction", type=float, default=0.5,
                   help="drop (not trim) docs covered above this")
    p.add_argument("--no-excise", action="store_true")
    p.add_argument("--eval-set", default=None,
                   help="parquet dir of benchmark docs to decontaminate against")
    p.add_argument("--decon-n", type=int, default=13)
    p.add_argument("--jobs", type=int, default=None, help="local-mode cores")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)

    from pyspark.sql import SparkSession, functions as F

    if args.jobs:
        from dedup_spark.session import get_spark

        spark = get_spark("clean_job", cores=args.jobs)
    else:
        spark = SparkSession.builder.appName("clean_job").getOrCreate()

    docs = spark.read.parquet(args.input)
    idc = args.id_col
    n_in = docs.count()
    report = {"docs_in": n_in}

    out = docs
    if not args.no_excise:
        from dedup_spark.operators.spandedup import duplicated_span_excision

        # the excision DAG feeds the stats agg, the keep filter, the
        # decontamination scan, and the final write — checkpoint it
        # once instead of recomputing the gram/coverage pipeline per
        # consumer (the multi-consumer rule)
        ex = duplicated_span_excision(
            docs, id_col=idc, text_col=args.text_col, k=args.span_k
        ).localCheckpoint(eager=False)
        agg = ex.agg(
            F.sum("n_covered").alias("w"),
            F.sum(
                (F.col("dup_fraction") > args.max_dup_fraction).cast("long")
            ).alias("d"),
        ).collect()[0]
        # sums over an EMPTY corpus aggregate to NULL, not 0
        report["words_excised"] = int(agg["w"] or 0)
        report["dropped_mostly_dup"] = int(agg["d"] or 0)
        keep = ex.filter(F.col("dup_fraction") <= args.max_dup_fraction)
        out = docs.drop(args.text_col).join(
            keep.select(idc, F.col("cleaned_text").alias(args.text_col)),
            on=idc,
        )

    if args.eval_set:
        from dedup_spark.operators.decontaminate import contamination_flags

        out = out.localCheckpoint(eager=False)  # consumed 3x below
        ev = spark.read.parquet(args.eval_set)
        flags = contamination_flags(
            out, ev, id_col=idc, text_col=args.text_col, n=args.decon_n
        )
        clean_ids = flags.filter(~F.col("contaminated")).select(idc)
        n_before = out.count()
        out = out.join(clean_ids, on=idc, how="left_semi")
        report["dropped_contaminated"] = n_before - out.count()

    out.write.mode("overwrite").parquet(args.output)
    report["docs_out"] = spark.read.parquet(args.output).count()

    import json

    rp = args.output.rstrip("/") + "_report"
    spark.createDataFrame([(json.dumps(report),)], "report string").coalesce(
        1
    ).write.mode("overwrite").json(rp)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
