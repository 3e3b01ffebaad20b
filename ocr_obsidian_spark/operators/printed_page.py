"""Cross-page printed-page mode switch — the pipeline's ONE shuffle,
restructured so the shuffle only ever moves five narrow columns.

Reference semantics (ingest/page_numbers.py:274-294 driven by
ingest/ocr.py:184,223-227): pages are processed in order per book; once a
page detects an arabic number >= arabic_switch_min, every LATER page's roman
detection is nulled. The triggering page itself keeps its value, and arabic
detections are never modified — so a page's roman result is nulled iff some
strictly-earlier page of the same book detected arabic >= threshold:

    max(is_strong_arabic) OVER (PARTITION BY book_id ORDER BY page_num
                                ROWS UNBOUNDED PRECEDING TO 1 PRECEDING)

Scale shape: the corpus rows are WIDE (nested lines/words, full text), and
book cardinality can be tiny relative to cores — windowing the full corpus
would funnel everything through few fat partitions. Instead:

  1. project the five narrow detection columns and window THOSE (cheap
     shuffle, bytes ~ 1% of the corpus);
  2. keep only the urls whose roman result must be nulled — sparse by
     construction (roman headers appearing after an arabic switch);
  3. null via a broadcast left join on url — the corpus itself never
     shuffles. The default auto-sizes: a cheap narrow count of the null
     set picks broadcast only below ``max_broadcast_nulls`` urls, so the
     adversarial corpus (roman headers after an arabic switch everywhere)
     degrades to a regular join instead of a driver OOM; pass
     ``broadcast_nulls=True/False`` to override either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..config import DEFAULT_CONFIG, PipelineConfig


def roman_null_set(corpus: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """urls whose roman detection is suppressed by the per-book mode switch."""
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
    narrow = corpus.select("url", "book_id", "page_num", "printed_page", "printed_page_kind")
    return (
        narrow.withColumn("_mode", F.coalesce(F.max(strong_arabic).over(w), F.lit(0)))
        .filter((F.col("_mode") == 1) & (F.col("printed_page_kind") == "roman"))
        .select("url")
    )


def apply_printed_page_mode(
    corpus: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    *,
    broadcast_nulls: bool | None = None,
    max_broadcast_nulls: int = 2_000_000,
) -> DataFrame:
    """``broadcast_nulls``: True forces the broadcast join, False forces a
    regular join, None (default) counts the null set first — one extra job
    over the five narrow columns — and broadcasts only when it holds fewer
    than ``max_broadcast_nulls`` urls (~2M urls ≈ low hundreds of MB on the
    driver; size to your driver memory)."""
    nulls = roman_null_set(corpus, cfg).withColumn("_null_roman", F.lit(True))
    if broadcast_nulls is None:
        # materialize the (sparse by construction) null set ONCE behind a
        # localCheckpoint (round 6): the sizing count then reads the
        # truncated blocks and the join broadcasts the same blocks, so
        # the narrow window pass executes exactly once instead of twice
        # (count + join recompute). Leak-free unlike persist(): truncated
        # blocks are dropped with the RDD, no session-lifetime cache.
        from .xengine import truncate_lineage

        nulls = truncate_lineage(nulls, "local")
        broadcast_nulls = nulls.count() <= max_broadcast_nulls
    if broadcast_nulls:
        nulls = F.broadcast(nulls)
    keep = F.col("_null_roman").isNull()
    return (
        corpus.join(nulls, "url", "left_outer")
        .withColumn("printed_page", F.when(keep, F.col("printed_page")))
        .withColumn("printed_page_text", F.when(keep, F.col("printed_page_text")))
        .withColumn("printed_page_kind", F.when(keep, F.col("printed_page_kind")))
        .drop("_null_roman")
    )
