"""Checkpoint-resumable runs: per-bucket manifest + idempotent bucket writes.

Re-expresses the reference's fail-closed overwrite / resume-by-run-id design
(ingest/utils_paths.py:75-95,105-117) for a distributed table:

  * the corpus is hash-bucketed on ``xxhash64(url)`` into ``n_buckets``
    checkpoint units (the partition column of the output table);
  * a small ``manifest`` table records (run_id, bucket, rows) — a bucket's
    manifest row is appended ONLY after its data is durably written and
    re-readable (fail-closed: torn writes never appear committed);
  * resuming the same run_id filters the input to buckets without a manifest
    row and rewrites exactly those via dynamic partition overwrite —
    idempotent, and completed buckets are never touched ("never" overwrite
    semantics for committed work, "if_same_run" for incomplete work).

One Spark job processes ALL pending buckets — no driver-side per-bucket loop,
so resume cost scales with remaining work, not bucket count.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

BUCKET_COL = "ck_bucket"


def with_bucket(df: DataFrame, n_buckets: int, url_col: str = "url") -> DataFrame:
    return df.withColumn(BUCKET_COL, F.pmod(F.xxhash64(url_col), F.lit(n_buckets)).cast("int"))


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def _data_path(out_dir: str) -> str:
    return os.path.join(out_dir, "data")


def completed_buckets(spark: SparkSession, out_dir: str, run_id: str) -> set[int]:
    path = _manifest_path(out_dir)
    try:
        mf = spark.read.parquet(path)
    except Exception:
        return set()
    rows = mf.filter(F.col("run_id") == run_id).select(BUCKET_COL).distinct().collect()
    return {int(r[0]) for r in rows}


def run_resumable(
    spark: SparkSession,
    pages: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    *,
    out_dir: str,
    run_id: str,
    n_buckets: int = 64,
    url_col: str = "url",
) -> int:
    """Run ``transform`` over the not-yet-committed buckets of ``pages`` and
    commit them; returns the number of buckets written this invocation."""
    done = completed_buckets(spark, out_dir, run_id)
    src = with_bucket(pages, n_buckets, url_col)
    if done:
        src = src.filter(~F.col(BUCKET_COL).isin(sorted(done)))

    out = transform(src.drop(BUCKET_COL))
    out = with_bucket(out, n_buckets, url_col)

    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            out.write.mode("overwrite")
            .partitionBy(BUCKET_COL)
            .parquet(_data_path(out_dir))
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)

    # fail-closed commit: count rows back from the durable files, then append
    # manifest rows for exactly the buckets written in this invocation.
    written = spark.read.parquet(_data_path(out_dir))
    if done:
        written = written.filter(~F.col(BUCKET_COL).isin(sorted(done)))
    manifest_rows = (
        written.groupBy(BUCKET_COL)
        .agg(F.count(F.lit(1)).alias("rows"))
        .withColumn("run_id", F.lit(run_id))
        .select("run_id", BUCKET_COL, "rows")
    )
    manifest_rows.write.mode("append").parquet(_manifest_path(out_dir))
    n_new = manifest_rows.count()
    return int(n_new)


def read_output(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(_data_path(out_dir)).drop(BUCKET_COL)
