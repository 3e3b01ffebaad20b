"""Streaming extraction: unbounded pages source → corpus sink.

Design notes (Spark-first):
  * ``extract_pages`` is a stateless Arrow-batched map — it composes with
    streaming DataFrames unchanged; one micro-batch = one bounded extract.
  * the per-book printed-page mode switch is NOT applied in-stream: it is
    an ordered fold over a whole book, undefined while a book is still
    arriving. It stays a batch fix-up over the corpus table (narrow,
    column-pruned — see operators/printed_page.py), mirroring how the
    reference derives everything downstream from the materialized corpus.
  * exactly-once sink semantics + resume come from the streaming
    checkpoint; this is the streaming twin of operators/checkpoint.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..operators.extract import extract_pages
from ..schemas import PAGES


def read_pages_stream(
    spark: SparkSession, input_dir: str, *, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(PAGES)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(input_dir)


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    *,
    available_now: bool = True,
) -> StreamingQuery:
    """pages stream → extracted corpus parquet, resumable via checkpoint.

    ``available_now=True`` drains everything currently in the source then
    stops (test/batch-catchup mode); False runs continuously.

    Checkpoint dirs are per-query: reusing one across different query
    shapes is NOT rejected by Spark when offsets are already committed
    (observed) — it silently no-ops. Always give each sink its own dir.
    """
    pages = read_pages_stream(spark, input_dir)
    corpus = extract_pages(pages, cfg)
    writer = (
        corpus.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup_pages(pages: DataFrame, *, watermark: str = "1 hour") -> DataFrame:
    """In-stream url dedup with bounded state: duplicates arriving within
    the watermark horizon are dropped; state older than the horizon is
    evicted (exact dedup across all time stays a batch job — see
    operators/dedup.py)."""
    return pages.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(["url"])


def stream_ingest_metrics(
    pages: DataFrame, *, window: str = "1 minute", watermark: str = "2 minutes"
) -> DataFrame:
    """Watermarked event-time ingest metrics: docs + bytes per (window,
    lang), tolerating late arrivals up to the watermark."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("html")).alias("n_bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_docs",
            "n_bytes",
        )
    )
