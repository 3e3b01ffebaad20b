"""Cross-page printed-page mode switch — the pipeline's ONE shuffle.

Reference semantics (ingest/page_numbers.py:274-294 driven by
ingest/ocr.py:184,223-227): pages are processed in order per book; once a
page detects an arabic number >= arabic_switch_min, every LATER page's roman
detection is nulled. The triggering page itself keeps its value, and arabic
detections are never modified — so a page's roman result is nulled iff some
strictly-earlier page of the same book detected arabic >= threshold.

That is exactly an ordered window with a strictly-preceding frame:

    max(is_strong_arabic) OVER (PARTITION BY book_id ORDER BY page_num
                                ROWS UNBOUNDED PRECEDING TO 1 PRECEDING)

Deterministic under any parallelism (page_num is unique per book); at scale
the shuffle is keyed on book_id — far smaller cardinality than url but far
larger than executor count, so it parallelizes; AQE handles residual skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..config import DEFAULT_CONFIG, PipelineConfig


def apply_printed_page_mode(
    corpus: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG
) -> DataFrame:
    switch_min = int(cfg.printed_page.arabic_switch_min)
    w = (
        Window.partitionBy("book_id")
        .orderBy("page_num", "url")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    strong_arabic = F.when(
        (F.col("printed_page_kind") == "arabic") & (F.col("printed_page") >= switch_min),
        F.lit(1),
    ).otherwise(F.lit(0))
    arabic_mode = F.coalesce(F.max(strong_arabic).over(w), F.lit(0)) == 1
    null_roman = arabic_mode & (F.col("printed_page_kind") == "roman")

    # materialize the flag once so the window evaluates a single time
    flagged = corpus.withColumn("_null_roman", null_roman)
    keep = F.col("_null_roman").isNull() | ~F.col("_null_roman")
    return (
        flagged.withColumn(
            "printed_page", F.when(keep, F.col("printed_page"))
        )
        .withColumn("printed_page_text", F.when(keep, F.col("printed_page_text")))
        .withColumn("printed_page_kind", F.when(keep, F.col("printed_page_kind")))
        .drop("_null_roman")
    )
