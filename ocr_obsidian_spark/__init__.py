"""ocr_obsidian_spark — a PySpark-native web-scale main-content extraction engine.

A from-scratch re-expression of the ocr-obsidian extraction semantics
(reference read-only at /root/reference) over Common-Crawl-style page tables:

    (url string, warc_ts timestamp, html binary, text string, lang string)

Architecture (Spark-first, NOT a port):
  * all page-local logic (tokenize, line segmentation, cleanup rendering,
    printed-page detection, span selection) runs inside Arrow-batched
    ``mapInPandas`` stages — one map pass over the corpus, zero shuffles
    on the hot path;
  * the single cross-row dependency (the per-book arabic page-number mode
    switch, reference ingest/page_numbers.py:274-294) is a Spark window;
  * everything relational (filters, joins, rankings, windows, aggregations,
    dedup, similarity search) is native DataFrame API so Catalyst/Tungsten
    optimize it (predicate pushdown, broadcast joins, whole-stage codegen);
  * skew from giant pages is defused with a salted repartition on
    ``xxhash64(url)``; AQE handles shuffle sizing.
"""

__all__ = ["__version__"]
__version__ = "0.1.0"
