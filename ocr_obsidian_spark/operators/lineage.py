"""Per-partition lineage + metrics rows (north-rule requirement).

Mirrors the reference's per-run debug artifacts and stage counters
(ingest/ocr.py:256-282,301-304; ingest/artifacts.py:26-59) as DATA: one row
per Spark partition per stage with row/byte counts, url range and wall time.
Implemented as a pass-through-free ``mapInPandas`` aggregation — each task
reduces its own partition locally (no shuffle) and emits a single row.
"""

from __future__ import annotations

import time
from typing import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame

from ..schemas import LINEAGE


def partition_metrics(
    df: DataFrame, *, run_id: str, stage: str, config_hash: str,
    url_col: str = "url",
) -> DataFrame:
    """One metrics row per partition of ``df``.

    ``bytes_in`` approximates partition payload as the summed byte length of
    string/binary columns — a stable, cheap proxy for input volume.
    """
    cols = [f.name for f in LINEAGE.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t0 = time.monotonic()
        ctx = TaskContext.get()
        pid = int(ctx.partitionId()) if ctx is not None else -1
        rows = 0
        nbytes = 0
        min_url: str | None = None
        max_url: str | None = None
        for pdf in batches:
            rows += len(pdf)
            for col in pdf.columns:
                series = pdf[col]
                if series.dtype == object:
                    nbytes += int(
                        series.map(
                            lambda v: len(v) if isinstance(v, (str, bytes)) else 0
                        ).sum()
                    )
            if url_col in pdf.columns and len(pdf):
                lo = pdf[url_col].min()
                hi = pdf[url_col].max()
                min_url = lo if min_url is None else min(min_url, lo)
                max_url = hi if max_url is None else max(max_url, hi)
        wall_ms = (time.monotonic() - t0) * 1000.0
        yield pd.DataFrame(
            [
                {
                    "run_id": run_id,
                    "stage": stage,
                    "partition_id": pid,
                    "rows_in": rows,
                    "rows_out": rows,
                    "bytes_in": nbytes,
                    "wall_ms": wall_ms,
                    "min_url": min_url,
                    "max_url": max_url,
                    "config_hash": config_hash,
                }
            ],
            columns=cols,
        )

    return df.mapInPandas(run, schema=LINEAGE)
