#!/usr/bin/env python
"""Cluster entry point: checkpoint-resumable extraction over a pages table.

    ./scripts/make_pyfiles.sh  # build the zip AT SUBMIT TIME (never stale)
    spark-submit --py-files dist/ocr_obsidian_spark.zip \
        scripts/run_extract_job.py \
        --input /data/pages_parquet --out /data/corpus --run-id 2026-08-16T00 \
        --buckets 4096

Resumable: re-running with the same --run-id/--out skips committed buckets
(ocr_obsidian_spark.operators.checkpoint). Lineage rows land under
<out>/_lineage. At 10^12 docs, size --buckets so one bucket ≈ one
executor-hour of work.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="pages table path (parquet)")
    ap.add_argument("--out", required=True, help="output corpus directory")
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--buckets", type=int, default=256)
    ap.add_argument("--salt-partitions", type=int, default=0)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("ocr-obsidian-extract").getOrCreate()

    from ocr_obsidian_spark.config import DEFAULT_CONFIG, PipelineConfig
    from ocr_obsidian_spark.operators.checkpoint import read_output, run_resumable
    from ocr_obsidian_spark.operators.extract import (
        extract_pages_with_lineage,
        split_extract_lineage,
    )
    from ocr_obsidian_spark.operators.printed_page import apply_printed_page_mode

    cfg = PipelineConfig(salt_partitions=args.salt_partitions) if args.salt_partitions else DEFAULT_CONFIG

    # SINGLE PASS: corpus rows + per-partition lineage rows come out of the
    # same mapInPandas; lineage rows carry a synthetic lineage:// url so
    # they bucket and commit exactly like data — no second read of the
    # input, and resume semantics cover the metrics too.
    pages = spark.read.parquet(args.input)
    n_new = run_resumable(
        spark,
        pages,
        lambda df: extract_pages_with_lineage(df, cfg, run_id=args.run_id),
        out_dir=args.out,
        run_id=args.run_id,
        n_buckets=args.buckets,
    )
    print(f"committed {n_new} new buckets")

    corpus_raw, lineage = split_extract_lineage(read_output(spark, args.out))
    # idempotent lineage export: this run's rows overwrite a per-run_id
    # subdirectory — a rerun/resume never re-appends rows already exported
    # (append mode duplicated the full lineage history on every invocation)
    lineage.filter(F.col("run_id") == args.run_id).write.mode("overwrite").parquet(
        f"{args.out}/_lineage/run_id={args.run_id}"
    )
    corpus = apply_printed_page_mode(corpus_raw, cfg)
    print(f"corpus rows: {corpus.count()}, lineage rows: {lineage.count()}")
    spark.stop()


if __name__ == "__main__":
    main()
