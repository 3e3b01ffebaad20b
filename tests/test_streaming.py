"""Structured Streaming extraction: incremental processing + checkpoint
resume + watermarked aggregation + in-stream dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_obsidian_spark.schemas import PAGES
from ocr_obsidian_spark.streaming.stream_extract import (
    read_pages_stream,
    stream_dedup_pages,
    stream_extract,
    stream_ingest_metrics,
)


@pytest.fixture()
def dirs(tmp_path):
    d = {k: str(tmp_path / k) for k in ("input", "out", "ckpt")}
    (tmp_path / "input").mkdir()
    return d


def _write_chunk(spark, fixture_pages, input_dir, lo, hi, name):
    spark.createDataFrame(fixture_pages[lo:hi], schema=PAGES).coalesce(1).write.mode(
        "append"
    ).parquet(input_dir)


def test_stream_extract_incremental_and_resumable(spark, fixture_pages, dirs):
    _write_chunk(spark, fixture_pages, dirs["input"], 0, 20, "c1")
    q = stream_extract(spark, dirs["input"], dirs["out"], dirs["ckpt"])
    q.awaitTermination(120)
    out1 = spark.read.parquet(dirs["out"])
    assert out1.count() == 20

    # new files arrive; restarting from the checkpoint processes ONLY them
    _write_chunk(spark, fixture_pages, dirs["input"], 20, 35, "c2")
    q2 = stream_extract(spark, dirs["input"], dirs["out"], dirs["ckpt"])
    q2.awaitTermination(120)
    out2 = spark.read.parquet(dirs["out"])
    assert out2.count() == 35
    # no duplicates: every url exactly once
    assert out2.select("url").distinct().count() == 35
    # content identical to the batch path
    from ocr_obsidian_spark.operators.extract import extract_pages

    batch = extract_pages(
        spark.createDataFrame(fixture_pages[:35], schema=PAGES)
    ).select("url", "extracted_text")
    got = {r["url"]: r["extracted_text"] for r in out2.select("url", "extracted_text").collect()}
    for r in batch.collect():
        assert got[r["url"]] == r["extracted_text"]


def test_stream_ingest_metrics_watermarked(spark, fixture_pages, dirs, tmp_path):
    _write_chunk(spark, fixture_pages, dirs["input"], 0, 30, "c1")
    pages = read_pages_stream(spark, dirs["input"])
    metrics = stream_ingest_metrics(pages, window="10 minutes", watermark="5 minutes")
    out = str(tmp_path / "metrics")
    q = (
        metrics.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "mckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits windows the watermark has closed — with a
    # single drained batch that can legitimately be zero rows; the plan
    # must at least run and produce the right schema
    got = spark.read.schema(
        "window_start timestamp, window_end timestamp, lang string, n_docs long, n_bytes long"
    ).parquet(out)
    assert got.columns == ["window_start", "window_end", "lang", "n_docs", "n_bytes"]


def test_stream_mode_switch_stateful_across_restarts(spark, fixture_pages, dirs, tmp_path):
    """applyInPandasWithState per-book mode switch: the arabic trigger in
    micro-batch 1 must null a roman arriving in a LATER query run — the
    keyed state lives in the streaming checkpoint across restarts."""
    from ocr_obsidian_spark.operators.extract import extract_pages
    from ocr_obsidian_spark.streaming.stream_extract import (
        MODE_SWITCH_OUT,
        stream_mode_switch,
    )

    # book b00 script (fixtures): p1 ix, p2 x, p3 arabic 3 (< switch), p4
    # arabic 12 (switch!), p5 roman xx (must be nulled), p6 arabic 14
    b00 = [r for r in fixture_pages if "/book_b00/" in r["url"]][:6]
    from ocr_obsidian_spark.schemas import PAGES

    corpus = extract_pages(spark.createDataFrame(b00, schema=PAGES)).select(
        "url", "book_id", "page_num", "printed_page", "printed_page_text", "printed_page_kind"
    ).collect()
    by_page = {r["page_num"]: r.asDict() for r in corpus}
    src, out, ckpt = str(tmp_path / "msrc"), str(tmp_path / "mout"), str(tmp_path / "mckpt")

    def feed(pages):
        spark.createDataFrame(
            [tuple(by_page[p][f.name] for f in MODE_SWITCH_OUT.fields) for p in pages],
            schema=MODE_SWITCH_OUT,
        ).coalesce(1).write.mode("append").parquet(src)

    def drain():
        stream = spark.readStream.schema(MODE_SWITCH_OUT).parquet(src)
        q = (
            stream_mode_switch(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    feed([1, 2, 3, 4])
    drain()
    got1 = {r["page_num"]: r for r in spark.read.parquet(out).collect()}
    assert got1[1]["printed_page_kind"] == "roman"  # before the switch: kept
    assert got1[4]["printed_page"] == 12            # the trigger keeps its value

    feed([5, 6])  # arrives in a SEPARATE query run
    drain()
    got2 = {r["page_num"]: r for r in spark.read.parquet(out).collect()}
    assert len(got2) == 6
    assert got2[5]["printed_page"] is None          # nulled via restored state
    assert got2[5]["printed_page_kind"] is None
    assert got2[6]["printed_page"] == 14

    # matches the batch window semantics exactly
    from ocr_obsidian_spark.operators.printed_page import apply_printed_page_mode

    batch = {
        r["page_num"]: (r["printed_page"], r["printed_page_kind"])
        for r in apply_printed_page_mode(
            extract_pages(spark.createDataFrame(b00, schema=PAGES))
        ).collect()
    }
    for p in range(1, 7):
        assert (got2[p]["printed_page"], got2[p]["printed_page_kind"]) == batch[p], p


def test_stream_dedup_drops_in_horizon_duplicates(spark, fixture_pages, dirs, tmp_path):
    dup_rows = fixture_pages[:10] + fixture_pages[:10]  # exact duplicate urls
    spark.createDataFrame(dup_rows, schema=PAGES).coalesce(1).write.mode("append").parquet(
        dirs["input"]
    )
    pages = read_pages_stream(spark, dirs["input"])
    deduped = stream_dedup_pages(pages, watermark="1 hour")
    out = str(tmp_path / "dedup")
    q = (
        deduped.select("url", "warc_ts").writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "dckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 10
    assert got.select("url").distinct().count() == 10


def test_stream_gate_documents_equals_batch_gates(spark, tmp_path):
    """The streaming gate chain must produce EXACTLY the batch gate
    prefix's keep-set on the same input (same operators, same order) —
    the stream-the-gates / batch-the-dedup split is only sound if the
    gates themselves are arrival-invariant."""
    from pyspark.sql import functions as F

    from ocr_obsidian_spark.streaming.stream_webprep import stream_gate_documents
    from test_recipe import _fixture_rows

    docs = spark.createDataFrame(_fixture_rows(), ["doc_id", "url", "text"])
    src = str(tmp_path / "sg_in")
    # two files -> at least two micro-batch-able splits
    docs.repartition(2).write.parquet(src)

    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    gated = stream_gate_documents(stream, langs=["en"])
    out = str(tmp_path / "sg_out")
    q = (
        gated.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "sg_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = stream_gate_documents(docs, langs=["en"])
    got = spark.read.parquet(out)
    assert {r["doc_id"] for r in got.collect()} == {
        r["doc_id"] for r in batch.collect()
    }
    # rows, not just ids: gated text and lang ride through identically
    assert {
        (r["doc_id"], r["text"], r["lang_id"]) for r in got.collect()
    } == {(r["doc_id"], r["text"], r["lang_id"]) for r in batch.collect()}
    assert got.count() > 0


def test_stream_dedup_documents_content_hash(spark, tmp_path):
    """Streaming exact-content dedup: same-content docs (different ids,
    whitespace-variant text — the NORMALIZED key) collapse within the
    watermark horizon."""
    import datetime

    from ocr_obsidian_spark.streaming.stream_webprep import stream_dedup_documents

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (0, t0, "the same document text."),
        (1, t0, "the  same   document text."),   # normalized duplicate
        (2, t0, "a different document text."),
        (3, t0, "the same document text."),       # exact duplicate
    ]
    src = str(tmp_path / "sd_in")
    spark.createDataFrame(
        rows, "doc_id long, warc_ts timestamp, text string"
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, warc_ts timestamp, text string"
    ).parquet(src)
    out = str(tmp_path / "sd_out")
    q = (
        stream_dedup_documents(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "sd_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 2
    texts = {r["text"] for r in got.collect()}
    assert "a different document text." in texts
