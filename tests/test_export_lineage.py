"""export-book-text operator (reference cli.py:162-215 analog) + lineage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_obsidian_spark.config import DEFAULT_CONFIG
from ocr_obsidian_spark.operators.export_text import export_book_text
from ocr_obsidian_spark.operators.extract import extract_pages
from ocr_obsidian_spark.operators.lineage import partition_metrics
from ocr_obsidian_spark.operators.printed_page import apply_printed_page_mode


@pytest.fixture(scope="module")
def corpus(spark, pages_df):
    return apply_printed_page_mode(extract_pages(pages_df)).cache()


def test_export_txt_ordered_and_complete(corpus):
    out = {r["book_id"]: r["content"] for r in export_book_text(corpus, fmt="txt").collect()}
    assert set(out) == {"b00", "b01", "b02"}
    content = out["b01"]
    # every page contributes a header, in page order
    positions = [content.find(f"# Page {p}\n") for p in range(1, 19)]
    assert all(p >= 0 for p in positions)
    assert positions == sorted(positions)
    # garbage page carries the placeholder
    assert "OCR LOW QUALITY" in content


def test_export_md_headers(corpus):
    out = {r["book_id"]: r["content"] for r in export_book_text(corpus, fmt="md").collect()}
    md = out["b00"]
    assert md.startswith("# b00\n\n")
    assert "## Page " in md and "(scan: scan_0001.png)" in md
    # printed page preferred for display: book b00 page 4 detected arabic 12
    assert "## Page 12 (scan: scan_0004.png)" in md


def _reference_export(rows, fmt, title=None):
    """Byte-exact replica of reference cli.py:173-209 part assembly, driven
    from the same per-page values the Spark operator consumes."""
    pages = sorted(rows, key=lambda r: int(r["page_num"]))
    if fmt == "md":
        book_id = pages[0]["book_id"]
        parts = [f"# {title or book_id}".strip(), ""]
    else:
        parts = []
    for page in pages:
        page_num = int(page["page_num"])
        printed = page["printed_page"]
        display = page_num if printed in (None, "") else printed
        scan = page["scan_relpath"] or ""
        page_text = page["extracted_text"] or ""
        if fmt == "md":
            parts.append(f"## Page {display} (scan: {scan})".rstrip())
            parts.append(page_text.strip())
            parts.append("---")
            parts.append("")
        else:
            parts.append(f"# Page {page_num}\n{page_text}".strip())
    return "\n\n".join(parts).strip() + "\n"


@pytest.mark.parametrize("fmt", ["txt", "md"])
def test_export_byte_identical_to_reference_join(corpus, fmt):
    """The reference's empty separator parts give 4-newline gaps (md) and
    str.strip() removes newlines, not just spaces — pinned byte-for-byte."""
    by_book: dict[str, list] = {}
    for r in corpus.collect():
        by_book.setdefault(r["book_id"], []).append(r.asDict())
    out = {r["book_id"]: r["content"] for r in export_book_text(corpus, fmt=fmt).collect()}
    assert set(out) == set(by_book)
    for book_id, rows in by_book.items():
        assert out[book_id] == _reference_export(rows, fmt), book_id


def test_lineage_rows_cover_all_partitions(spark, corpus):
    df = corpus.repartition(6)
    rows = partition_metrics(
        df, run_id="r", stage="extract", config_hash=DEFAULT_CONFIG.config_hash()
    ).collect()
    assert len(rows) == 6
    assert sum(r["rows_in"] for r in rows) == corpus.count()
    assert all(r["stage"] == "extract" and r["run_id"] == "r" for r in rows)
    covered = [r for r in rows if r["min_url"] is not None]
    assert covered and all(r["min_url"] <= r["max_url"] for r in covered)
    assert sum(r["bytes_in"] for r in rows) > 0


def test_single_pass_extract_lineage(spark, pages_df):
    """extract_pages_with_lineage emits corpus AND per-partition metrics
    from one map stage; the corpus half is identical to extract_pages."""
    from ocr_obsidian_spark.operators.extract import (
        extract_pages,
        extract_pages_with_lineage,
        split_extract_lineage,
    )

    src = pages_df.repartition(5)
    combined = extract_pages_with_lineage(src, run_id="sp").cache()
    got_corpus, lineage = split_extract_lineage(combined)
    lrows = lineage.collect()
    assert len(lrows) == 5
    assert sum(r["rows_in"] for r in lrows) == pages_df.count()
    assert all(r["stage"] == "extract" and r["run_id"] == "sp" for r in lrows)
    assert sum(r["bytes_in"] for r in lrows) > 0
    covered = [r for r in lrows if r["min_url"] is not None]
    assert covered and all(r["min_url"] <= r["max_url"] for r in covered)
    a = {r["url"]: r["extracted_text"] for r in got_corpus.collect()}
    b = {r["url"]: r["extracted_text"] for r in extract_pages(pages_df).collect()}
    assert a == b
    combined.unpersist()


def test_pipeline_result_carries_lineage(spark, pages_df):
    from ocr_obsidian_spark.plans.pipeline import run_pipeline

    res = run_pipeline(pages_df, run_id="lr")
    rows = res.lineage.collect()
    assert rows and sum(r["rows_in"] for r in rows) == pages_df.count()


def test_jsonl_corpus_roundtrip(spark, corpus, tmp_path):
    from ocr_obsidian_spark.sources.io import read_corpus_jsonl, write_jsonl

    path = str(tmp_path / "corpus_jsonl")
    write_jsonl(corpus.drop("warc_ts"), path)  # json timestamps lose tz fidelity
    back = read_corpus_jsonl(spark, path)
    a = {r["url"]: (r["extracted_text"], r["lines_json"]) for r in corpus.collect()}
    b = {r["url"]: (r["extracted_text"], r["lines_json"]) for r in back.collect()}
    assert a == b


def test_write_table_fail_closed(spark, corpus, tmp_path):
    from ocr_obsidian_spark.sources.io import read_table, write_table

    path = str(tmp_path / "tbl")
    write_table(corpus.select("url", "extracted_text"), path)
    import pytest as _pytest
    with _pytest.raises(Exception):
        write_table(corpus.select("url", "extracted_text"), path)  # mode=error
    assert read_table(spark, path).count() == corpus.count()


def test_frame_crop_candidates_dropped(spark, corpus):
    from ocr_obsidian_spark.operators.spans_op import filter_block_candidates
    from pyspark.sql import functions as F

    rows = [
        # wholly in the left margin band (x2 <= 0.02*1000 = 20)
        ("u1", [{"bbox": [2, 300, 18, 340], "area": 640, "color_stats": {}}]),
        # normal block
        ("u2", [{"bbox": [100, 300, 500, 340], "area": 16000, "color_stats": {}}]),
    ]
    from ocr_obsidian_spark.schemas import TRIGGERS
    t = spark.createDataFrame(rows, schema=TRIGGERS)
    t = t.withColumn("page_width", F.lit(1000)).withColumn("page_height", F.lit(1400))
    out = {r["url"]: len(r["candidates"]) for r in filter_block_candidates(t).collect()}
    assert out["u1"] == 0
    assert out["u2"] == 1


def test_run_extract_job_script_rerun_idempotent(spark, pages_df, tmp_path, monkeypatch):
    """The cluster entry script end-to-end, twice with the same run_id: the
    second invocation must commit 0 new buckets, keep the corpus intact,
    and NOT duplicate lineage rows in _lineage (round-2 ADVICE: the old
    append-mode export re-appended the full history every rerun)."""
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    import run_extract_job

    inp = str(tmp_path / "pages_in")
    out = str(tmp_path / "job_out")
    pages_df.write.parquet(inp)

    def run_once():
        monkeypatch.setattr(
            sys, "argv",
            ["run_extract_job.py", "--input", inp, "--out", out,
             "--run-id", "rX", "--buckets", "8"],
        )
        # reuse the session-scoped spark instead of building a new one
        monkeypatch.setattr(
            run_extract_job.SparkSession, "builder", _FakeBuilder(spark)
        )
        run_extract_job.main()

    class _FakeBuilder:
        def __init__(self, s):
            self._s = s
        def appName(self, _):
            return self
        def getOrCreate(self):
            return self._s

    stopped = {"n": 0}
    monkeypatch.setattr(spark, "stop", lambda: stopped.__setitem__("n", stopped["n"] + 1))
    run_once()
    lineage1 = spark.read.parquet(f"{out}/_lineage/run_id=rX").collect()
    run_once()
    lineage2 = spark.read.parquet(f"{out}/_lineage/run_id=rX").collect()
    assert len(lineage2) == len(lineage1)  # no duplication on rerun
    from ocr_obsidian_spark.operators.checkpoint import read_output
    from ocr_obsidian_spark.operators.extract import split_extract_lineage

    corpus, _ = split_extract_lineage(read_output(spark, out))
    assert corpus.count() == pages_df.count()
    assert stopped["n"] == 2


def test_write_table_iceberg_gate_and_format_validation(spark, corpus, tmp_path):
    """The iceberg sink goes through the V2 writeTo path; in this
    sandbox (no iceberg runtime/catalog) the gate must fail with an
    ACTIONABLE configuration error naming the catalog knob, not a raw
    CATALOG_NOT_FOUND stack; unknown formats fail closed either way."""
    import pytest as _pytest

    from ocr_obsidian_spark.sources.io import read_table, write_table

    df = corpus.select("url", "extracted_text")
    with _pytest.raises(RuntimeError, match="spark.sql.catalog"):
        write_table(df, "ice.db.tbl", format="iceberg")
    with _pytest.raises(RuntimeError, match="spark.sql.catalog"):
        write_table(df, "ice.db.tbl", mode="overwrite", format="iceberg")
    with _pytest.raises(ValueError, match="unknown table format"):
        write_table(df, str(tmp_path / "x"), format="orc")
    with _pytest.raises(ValueError, match="unknown table format"):
        read_table(spark, "x", format="orc")
    with _pytest.raises(RuntimeError, match="spark.sql.catalog"):
        read_table(spark, "ice.db.tbl", format="iceberg")
    with _pytest.raises(ValueError, match="unknown mode"):
        write_table(df, "ice.db.tbl", mode="bogus", format="iceberg")
