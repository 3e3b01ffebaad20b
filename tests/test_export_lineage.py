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
