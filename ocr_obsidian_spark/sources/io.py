"""Table IO: parquet-first with JSONL interchange for reference-style
corpus fixtures.

The reference's canonical corpus is JSONL (ingest/artifacts.py:43-59 write,
ingest/textmap.py:8-18 tolerant read). Our canonical store is parquet (or
Iceberg on a real cluster — `df.writeTo(...)`; the Iceberg runtime jar is
not present in this sandbox, so `write_table` stays parquet and the call
site is the single place to swap). JSONL remains supported as an
interchange format so reference-produced fixtures can be ingested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import CORPUS


def read_corpus_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL → corpus frame with the EXPLICIT schema (never inferred; the
    reference's tolerant-read semantics live inside the consuming UDFs,
    not in schema inference). This is the reader for reference-style
    ``pages.jsonl`` corpora re-expressed in our column layout."""
    return spark.read.schema(CORPUS).json(path)


def write_jsonl(df: DataFrame, path: str, *, mode: str = "error") -> None:
    """Corpus/fixture JSONL sink (reference write_jsonl_records analog;
    fail-closed by default: mode='error' refuses to overwrite)."""
    df.write.mode(mode).json(path)


def write_table(df: DataFrame, path: str, *, mode: str = "error", partition_by: list[str] | None = None) -> None:
    """Canonical table sink. Parquet here; on an Iceberg-enabled cluster
    replace the body with ``df.writeTo(path).append()`` /
    ``overwritePartitions()`` — fail-closed default matches
    check_write_allowed('never') (reference ingest/utils_paths.py:75-95)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
