"""The extraction spine: pages(url, warc_ts, html, text, lang) → corpus.

One ``mapInPandas`` pass does ALL page-local work — tokenize, word admission,
line segmentation, cleanup rendering, QA metrics + gate, printed-page
detection — so the hot path has exactly zero shuffles (the reference's whole
per-page loop, ingest/ocr.py:187-254 + cli.py:162-215, collapses into this
stage). The only cross-row dependency (arabic mode switch) lives in
operators/printed_page.py as a window.

Scale design (10^12-doc target):
  * ``html`` is by far the widest column; it is consumed inside this stage
    and never appears in the output schema, so downstream stages prune it
    at the parquet/Iceberg scan.
  * skew from giant pages is defused by an optional pre-repartition on
    ``xxhash64(url)`` (urls are unique ⇒ uniform spread) and bounded Arrow
    batches (``spark.sql.execution.arrow.maxRecordsPerBatch``).
  * per-partition lineage/metrics rows are emitted by operators/lineage.py.
"""

from __future__ import annotations

import json
import re
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..functions.geometry import admit_word, group_lines
from ..functions.qa import compute_text_metrics, is_garbage_page, low_quality_placeholder
from ..functions.romans import detect_printed_page, infer_scan_side
from ..functions.textclean import render_page_text, render_raw_text
from ..schemas import CORPUS
from ..sources.fixtures import parse_page_payload

_URL_BOOK_RE = re.compile(r"/book_([^/]+)/page_(\d+)")

# the extract stage emits the full canonical corpus schema (the final
# extracted_text is page-local: QA gate + placeholder only depend on the
# page itself)
CORPUS_OUT = CORPUS


def parse_url_book_page(url: str) -> tuple[str, int]:
    """(book_id, page_num) from a fixture-style url; generic urls fall back
    to (host, 0) — ordering for those comes from warc_ts."""
    m = _URL_BOOK_RE.search(url)
    if m:
        return m.group(1), int(m.group(2))
    host = url.split("//", 1)[-1].split("/", 1)[0]
    return host, 0


def _extract_one(url: str, html: Any, cfg: PipelineConfig) -> dict[str, Any]:
    book_id, page_num = parse_url_book_page(url)

    # fail-soft decode: at 10^12 docs a single corrupt payload must degrade
    # to an (empty, flagged) page, never kill the stage
    parse_ok = True
    if html is None:
        payload: dict[str, Any] = {}
        parse_ok = False
    else:
        try:
            payload = parse_page_payload(html)
        except Exception:
            payload = {}
            parse_ok = False
    page_width = int(payload.get("page_width", 1000))
    page_height = int(payload.get("page_height", 1400))
    scan_relpath = str(payload.get("scan_relpath", ""))

    words = []
    raw_words = payload.get("words", [])
    if not isinstance(raw_words, list):
        raw_words = []
        parse_ok = False
    for w in raw_words:
        try:
            bbox = [int(v) for v in w["b"]]
            admitted = admit_word(
                w.get("t", ""), w.get("c"), bbox[2] - bbox[0], bbox[3] - bbox[1]
            )
        except (TypeError, ValueError, KeyError, IndexError):
            parse_ok = False
            continue
        if admitted:
            words.append(
                {"text": str(w["t"]).strip(), "bbox": bbox, "confidence": float(w["c"])}
            )

    lines = group_lines(words, page_num, cfg.line_y_tolerance_px)
    raw_text = render_raw_text(lines)
    metrics = compute_text_metrics(lines)
    garbage = is_garbage_page(metrics, cfg.qa)
    clean = render_page_text(lines) if cfg.clean_text else raw_text
    if garbage:
        extracted = low_quality_placeholder(metrics, scan_relpath)
    else:
        extracted = clean

    pp = {"printed_page": None, "printed_page_text": None, "printed_page_kind": None}
    if cfg.printed_page.detect:
        pp = detect_printed_page(
            words,
            lines,
            page_width=page_width,
            page_height=page_height,
            top_band_frac=cfg.printed_page.top_band_frac,
            min_conf=cfg.printed_page.min_conf,
            roman_min_len=cfg.printed_page.roman_min_len,
            roman_max_value=cfg.printed_page.roman_max_value,
            side=infer_scan_side(scan_relpath),
            max_top_lines=cfg.printed_page.max_top_lines,
        )

    return {
        "book_id": book_id,
        "page_num": page_num,
        "scan_relpath": scan_relpath,
        "page_width": page_width,
        "page_height": page_height,
        "lines_json": json.dumps(lines, ensure_ascii=False, separators=(",", ":")),
        "raw_text": raw_text,
        "clean_text": clean,
        "extracted_text": extracted,
        "char_count": int(metrics["char_count"]),
        "line_count": int(metrics["line_count"]),
        "avg_word_conf": metrics["avg_word_conf"],
        "alpha_ratio": float(metrics["alpha_ratio"]),
        "garbage_ratio": float(metrics["garbage_ratio"]),
        "pipe_ratio": float(metrics["pipe_ratio"]),
        "is_garbage": bool(garbage),
        "parse_ok": parse_ok,
        "printed_page": pp["printed_page"],
        "printed_page_text": pp["printed_page_text"],
        "printed_page_kind": pp["printed_page_kind"],
    }


def extract_pages(df: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """pages → corpus (one Arrow-batched map stage, no shuffle unless salting
    is requested via ``cfg.salt_partitions``)."""
    config_hash = cfg.config_hash()
    out_cols = [f.name for f in CORPUS_OUT.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # columnar accumulation (dict-of-lists) — noticeably cheaper
            # than pd.DataFrame(list-of-dicts) at batch granularity
            data: dict[str, list[Any]] = {k: [] for k in out_cols}
            for url, warc_ts, html, lang in zip(
                pdf["url"], pdf["warc_ts"], pdf["html"], pdf["lang"]
            ):
                rec = _extract_one(url, html, cfg)
                rec["url"] = url
                rec["warc_ts"] = warc_ts
                rec["lang"] = lang
                rec["config_hash"] = config_hash
                for k in out_cols:
                    data[k].append(rec[k])
            yield pd.DataFrame(data, columns=out_cols)

    src = df.select("url", "warc_ts", "html", "lang")
    if cfg.salt_partitions > 0:
        src = src.repartition(cfg.salt_partitions, F.xxhash64("url"))
    return src.mapInPandas(run, schema=CORPUS_OUT)


def parse_lines_json(lines_json: str | None) -> list[dict[str, Any]]:
    """lines_json column → list of line dicts (executor-side helper for the
    spans/emit consumers)."""
    if not lines_json:
        return []
    return json.loads(lines_json)
