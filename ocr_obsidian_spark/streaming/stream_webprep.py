"""Streaming web-corpus preparation: the stateless gate prefix of the
composed recipe (operators/recipe.py) over an unbounded documents
stream, plus bounded-state streaming content dedup.

What streams and what doesn't (Spark-first honesty):
  * every GATE is a stateless map — language ID (Arrow NB cascade),
    Gopher doc-shape + repetition rules, C4 line cleaning compose with
    streaming DataFrames unchanged, one micro-batch at a time, and are
    pinned EQUAL to the batch gate prefix on the same input
    (tests/test_streaming.py);
  * content-level dedup streams with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` on the normalized content hash —
    duplicates arriving within the horizon drop, state older than the
    horizon evicts, so state holds the live working set, not the corpus;
  * cross-document line dedup, MinHash near-dedup and all-time exact
    dedup need corpus-wide state and remain batch sweeps over the
    accumulated sink (run the recipe tail periodically) — the standard
    stream-the-gates / batch-the-dedup split of production pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.recipe import gate_documents


def stream_gate_documents(
    docs: DataFrame,
    *,
    text_col: str = "text",
    langs: list[str] | None = None,
    gopher: bool = True,
    gopher_rep: bool = True,
    c4: bool = True,
) -> DataFrame:
    """The recipe's gate chain as a streaming transform — literally the
    SAME implementation (operators/recipe.py gate_documents, stateless
    maps only), so the streaming prefix can never silently diverge from
    the batch recipe's keep-set. Output columns: the input's +
    ``lang_id``."""
    return gate_documents(
        docs,
        text_col=text_col,
        langs=langs,
        gopher=gopher,
        gopher_rep=gopher_rep,
        c4=c4,
    )


def stream_dedup_documents(
    docs: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "warc_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """In-stream exact content dedup with bounded state: key = sha256 of
    the normalized text (the batch exact-dedup key, operators/dedup.py),
    horizon = ``watermark`` on the event-time column. Re-crawls within
    the horizon collapse to the first arrival; the all-time sweep stays
    a batch job."""
    from ..operators.dedup import normalized_text

    if "_chash" in docs.columns:
        # the working column would silently overwrite-then-drop the
        # caller's data; _-prefixed working columns assume absence
        raise ValueError("input already has a _chash column; rename it")
    keyed = docs.withColumn("_chash", F.sha2(normalized_text(text_col), 256))
    return (
        keyed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_chash"])
        .drop("_chash")
    )
