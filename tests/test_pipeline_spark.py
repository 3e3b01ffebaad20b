"""End-to-end Spark pipeline vs a driver-side oracle built from the
reference's own functions (imported from /root/reference, PIL stubbed).

The north-rule invariant: extracted text is BYTE-IDENTICAL per url to what
the reference renderer produces for the same token stream; printed-page
fields (including the cross-page mode switch) and spans match exactly.
"""

from __future__ import annotations

import json

import pytest
from ingest.highlights import _passes_candidate_shape_filters as oracle_shape
from ingest.ocr import _group_lines as oracle_group
from ingest.page_numbers import (
    apply_printed_page_mode as oracle_mode,
    detect_printed_page as oracle_detect,
    infer_scan_side as oracle_side,
)
from ingest.qa_metrics import (
    compute_text_metrics as oracle_metrics,
    is_obviously_empty_or_garbage as oracle_gate,
)
from ingest.render_text import render_lines as oracle_render
from ingest.spans import (
    _bbox_union as oracle_union,
    _merge_raw_spans as oracle_merge,
    _select_line_indexes as oracle_select,
)
from ingest.types import OcrWord, PageRecord, to_jsonable

from ocr_obsidian_spark.config import DEFAULT_CONFIG
from ocr_obsidian_spark.plans.pipeline import run_pipeline


def _oracle_tokens(row):
    payload = json.loads(row["html"].decode("utf-8"))
    words = []
    for w in payload["words"]:
        text = str(w["t"]).strip()
        if not text:
            continue
        try:
            conf = float(w["c"])
        except (TypeError, ValueError):
            continue
        if conf < 0:
            continue
        x1, y1, x2, y2 = (int(v) for v in w["b"])
        if x2 - x1 <= 0 or y2 - y1 <= 0:
            continue
        words.append(OcrWord(text=text, bbox=[x1, y1, x2, y2], confidence=conf))
    return payload, words


def _book_page(url: str) -> tuple[str, int]:
    part = url.split("/book_", 1)[1]
    book, page = part.split("/page_")
    return book, int(page)


@pytest.fixture(scope="module")
def oracle_state(fixture_pages, fixture_triggers):
    """Reference pipeline run driver-side, sequentially per book."""
    cfg = DEFAULT_CONFIG
    by_book: dict[str, list[dict]] = {}
    for row in fixture_pages:
        book, page = _book_page(row["url"])
        by_book.setdefault(book, []).append(row)
    for rows in by_book.values():
        rows.sort(key=lambda r: _book_page(r["url"])[1])

    corpus: dict[str, dict] = {}
    for book, rows in by_book.items():
        mode = "auto"
        for row in rows:
            _, page_num = _book_page(row["url"])
            payload, words = _oracle_tokens(row)
            lines = oracle_group(words, page_num, cfg.line_y_tolerance_px)
            line_dicts = [to_jsonable(ln) for ln in lines]
            page_rec = PageRecord(
                book_id=book, page_num=page_num,
                scan_relpath=payload["scan_relpath"], ocr_engine="synthetic",
                config={}, words=words, lines=lines,
            )
            raw_result, _dbg = oracle_detect(
                page_rec,
                page_width=payload["page_width"],
                page_height=payload["page_height"],
                side=oracle_side(payload["scan_relpath"]),
            )
            result, mode = oracle_mode(
                raw_result, "arabic" if mode == "arabic" else "auto",
                arabic_switch_min=cfg.printed_page.arabic_switch_min,
            )
            metrics = oracle_metrics(line_dicts)
            if oracle_gate(metrics):
                avg = metrics.get("avg_word_conf")
                avg_text = "n/a" if avg is None else f"{float(avg):.1f}"
                extracted = (
                    f"OCR LOW QUALITY (avg_conf={avg_text}, "
                    f"garbage={float(metrics['garbage_ratio']):.3f}). "
                    f"See scan: {payload['scan_relpath']}"
                )
            else:
                extracted = oracle_render(line_dicts)
            corpus[row["url"]] = {
                "extracted": extracted,
                "printed_page": result.get("printed_page"),
                "printed_page_kind": result.get("printed_page_kind"),
                "lines": line_dicts,
                "page_num": page_num,
                "page_width": payload["page_width"],
                "page_height": payload["page_height"],
            }

    spans: dict[str, list[dict]] = {}
    s = cfg.spans
    b = cfg.blocks
    for trow in fixture_triggers:
        page = corpus.get(trow["url"])
        if page is None or not page["lines"]:
            continue
        kept = [
            [int(v) for v in c["bbox"]]
            for c in trow["candidates"]
            if c["area"] >= b.min_area
            and oracle_shape(
                list(c["bbox"]),
                page_width=page["page_width"], page_height=page["page_height"],
                edge_margin_px=b.edge_margin_px, max_hw_ratio=b.max_hw_ratio,
                max_height_frac=b.max_height_frac,
            )
        ]
        raw = []
        for trigger in kept:
            idxs = oracle_select(
                page["lines"], trigger,
                min_overlap_frac=s.min_overlap_frac,
                min_x_overlap_px=s.min_x_overlap_px,
                max_overlap_lines=s.max_overlap_lines,
            )
            anchor = sorted(idxs)[len(idxs) // 2]
            lo = max(0, anchor - s.k_before)
            hi = min(len(page["lines"]) - 1, anchor + s.k_after)
            sel = page["lines"][lo : hi + 1]
            raw.append(
                {
                    "page_num": page["page_num"],
                    "line_ids": [ln["line_id"] for ln in sel],
                    "trigger_bboxes": [trigger],
                    "span_bbox": oracle_union([ln["bbox"] for ln in sel]),
                }
            )
        if raw:
            merged = oracle_merge(raw)
            spans[trow["url"]] = [
                {**m, "span_id": f"p{page['page_num']}_s{i}"}
                for i, m in enumerate(merged, start=1)
            ]
    return corpus, spans


@pytest.fixture(scope="module")
def pipeline_result(spark, pages_df, triggers_df):
    res = run_pipeline(pages_df, triggers_df, DEFAULT_CONFIG, run_id="test-run")
    corpus = {r["url"]: r.asDict() for r in res.corpus.collect()}
    spans = {r["url"]: r.asDict(recursive=True) for r in res.spans.collect()}
    notes = [r.asDict() for r in res.notes.collect()]
    return corpus, spans, notes


def test_extracted_text_byte_identical_per_url(oracle_state, pipeline_result):
    oracle_corpus, _ = oracle_state
    corpus, _, _ = pipeline_result
    assert set(corpus) == set(oracle_corpus)
    mismatches = [
        url
        for url in oracle_corpus
        if corpus[url]["extracted_text"] != oracle_corpus[url]["extracted"]
    ]
    assert mismatches == []


def test_printed_page_mode_switch_matches(oracle_state, pipeline_result):
    oracle_corpus, _ = oracle_state
    corpus, _, _ = pipeline_result
    for url, exp in oracle_corpus.items():
        got = corpus[url]
        assert got["printed_page"] == exp["printed_page"], url
        assert got["printed_page_kind"] == exp["printed_page_kind"], url
    # the fixture's scripted switch page: roman on page 5 of book b00 nulled
    assert corpus["https://fixture.test/book_b00/page_0005"]["printed_page"] is None


def test_spans_match_oracle(oracle_state, pipeline_result):
    _, oracle_spans = oracle_state
    _, spans, _ = pipeline_result
    assert set(spans) == set(oracle_spans)
    for url, exp in oracle_spans.items():
        got = spans[url]["spans"]
        assert len(got) == len(exp), url
        for g, e in zip(got, exp):
            assert g["span_id"] == e["span_id"], url
            assert list(g["line_ids"]) == list(e["line_ids"]), url
            assert [list(t) for t in g["trigger_bboxes"]] == e["trigger_bboxes"], url
            assert list(g["span_bbox"]) == list(e["span_bbox"]), url


def test_notes_emitted_and_valid(pipeline_result):
    _, spans, notes = pipeline_result
    assert len(notes) > 0
    n_spans = sum(len(s["spans"]) for s in spans.values())
    assert len(notes) <= n_spans  # blank quotes skipped
    seen_paths = set()
    for n in notes:
        assert n["note_content"].startswith("---\n")
        assert "## Quote" in n["note_content"]
        assert n["quote_text"].strip()
        sidecar = json.loads(n["sidecar_json"])
        assert sidecar["span_id"] == n["span_id"]
        assert n["note_path"] not in seen_paths
        seen_paths.add(n["note_path"])


def test_malformed_payloads_fail_soft(spark):
    """At 10^12 docs a corrupt payload must degrade to a flagged row, never
    kill the stage — NULL html, truncated JSON, non-dict JSON, words of the
    wrong type, and words with broken bboxes all survive with
    parse_ok=False; detection skips them without error."""
    import datetime as _dt
    import json as _json

    from ocr_obsidian_spark.operators.blocks import detect_blocks
    from ocr_obsidian_spark.operators.extract import extract_pages
    from ocr_obsidian_spark.schemas import PAGES

    ts = _dt.datetime(2020, 1, 1, tzinfo=_dt.timezone.utc)
    good = _json.dumps(
        {"page_width": 1000, "page_height": 1400, "scan_relpath": "s.png",
         "words": [{"t": "Hello", "b": [10, 300, 60, 322], "c": 95.0}]}
    ).encode()
    rows = [
        ("https://x.test/book_b/page_0001", ts, None, "", "eng"),
        ("https://x.test/book_b/page_0002", ts, b"{truncated", "", "eng"),
        ("https://x.test/book_b/page_0003", ts, b"[1,2,3]", "", "eng"),
        ("https://x.test/book_b/page_0004", ts, b'{"words": 42}', "", "eng"),
        ("https://x.test/book_b/page_0005", ts,
         b'{"words": [{"t": "x", "b": [1], "c": 90.0}, {"t": "ok", "b": [0,0,30,20], "c": 90.0}]}',
         "", "eng"),
        ("https://x.test/book_b/page_0006", ts, good, "", "eng"),
    ]
    df = spark.createDataFrame(rows, schema=PAGES)
    out = {r["page_num"]: r for r in extract_pages(df).collect()}
    assert len(out) == 6
    for p in (1, 2, 3, 4, 5):
        assert out[p]["parse_ok"] is False, p
    assert out[6]["parse_ok"] is True
    assert out[6]["extracted_text"] == "Hello"
    # the salvageable word on page 5 still extracts
    assert out[5]["extracted_text"] == "ok"
    # detection skips undecodable/pixel-less pages silently
    assert detect_blocks(df).count() == 0


def test_determinism_across_partitionings(spark, pages_df):
    from ocr_obsidian_spark.operators.extract import extract_pages
    from ocr_obsidian_spark.operators.printed_page import apply_printed_page_mode

    a = apply_printed_page_mode(extract_pages(pages_df.repartition(1)))
    b = apply_printed_page_mode(extract_pages(pages_df.repartition(16)))
    rows_a = {r["url"]: (r["extracted_text"], r["printed_page"]) for r in a.collect()}
    rows_b = {r["url"]: (r["extracted_text"], r["printed_page"]) for r in b.collect()}
    assert rows_a == rows_b


def test_salted_repartition_same_results(spark, pages_df):
    from ocr_obsidian_spark.config import PipelineConfig
    from ocr_obsidian_spark.operators.extract import extract_pages

    cfg = PipelineConfig(salt_partitions=12)
    salted = {r["url"]: r["extracted_text"] for r in extract_pages(pages_df, cfg).collect()}
    plain = {r["url"]: r["extracted_text"] for r in extract_pages(pages_df).collect()}
    assert salted == plain


def test_mode_switch_autosizes_null_broadcast(spark):
    """Adversarial corpus — every book switches to arabic on page 1, romans
    everywhere after — must not broadcast the (huge) null set at the
    default: the auto path counts first and falls back to a regular join.
    Values are identical on both paths (round-2 verdict #7)."""
    from pyspark.sql import functions as F

    from ocr_obsidian_spark.operators.printed_page import apply_printed_page_mode

    rows = []
    for b in range(20):
        rows.append((f"b{b}/p0", f"b{b}", 0, 100, "100", "arabic"))
        for p in range(1, 30):
            rows.append((f"b{b}/p{p}", f"b{b}", p, p, "xiv", "roman"))
    corpus = spark.createDataFrame(
        rows,
        "url string, book_id string, page_num int, printed_page int, "
        "printed_page_text string, printed_page_kind string",
    )

    def null_count(df):
        return df.filter(F.col("printed_page").isNull()).count()

    def has_broadcast_hint(df):
        # the explicit driver-side hint is what risks OOM on a truly huge
        # set; AQE may still choose a runtime broadcast from actual sizes,
        # which is exactly the safe behavior the auto path delegates to
        return "strategy=broadcast" in df._jdf.queryExecution().optimizedPlan().toString()

    auto = apply_printed_page_mode(corpus, max_broadcast_nulls=10)
    assert not has_broadcast_hint(auto)
    forced = apply_printed_page_mode(corpus, broadcast_nulls=True)
    assert null_count(auto) == null_count(forced) == 20 * 29
    # the triggering arabic pages themselves are untouched
    assert auto.filter(F.col("printed_page_kind") == "arabic").count() == 20
    # sparse null set still broadcasts at the default threshold
    small = apply_printed_page_mode(corpus)
    assert has_broadcast_hint(small) and has_broadcast_hint(forced)
