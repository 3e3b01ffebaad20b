"""Derive Common-Crawl-shaped page rows from the driver's ``documents``
table — deterministically, executor-side (no driver materialization).

Used by ``__spark_entry__.entry`` and ``bench.py``: each document's text is
laid out as a synthetic token stream (the same byte format the fixture
generator emits, FIXTURES.md §1) so the full extraction pipeline can run at
any scale factor against driver-provided data. Derivation is pure
(doc_id-seeded), so output is identical at any parallelism.
"""

from __future__ import annotations

import json
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..schemas import PAGES

_EPOCH = pd.Timestamp("2020-01-01", tz="UTC")
_WORDS_PER_LINE = 8
_LINE_GAP = 40
_PAGE_W = 1000
_PAGE_H = 1400


def _doc_payload(doc_id: int, text: str) -> dict[str, Any]:
    """Deterministic page layout for one document.

    Adversarial cleanup patterns are injected on a doc_id-derived cadence so
    the scrub paths (junk drop, hyphen merge, low-conf spew) do real work in
    benchmarks, not just on unit fixtures.
    """
    toks = (text or "").split()
    words: list[dict[str, Any]] = []
    x, y = 60, 220
    col = 0
    for i, tok in enumerate(toks):
        conf = 95.0 - ((doc_id + i) % 7)
        if (doc_id + i) % 23 == 0:
            tok = tok + "-" if col == _WORDS_PER_LINE - 1 else tok
        w = max(8, 11 * len(tok))
        words.append({"t": tok, "b": [x, y, x + w, y + 22], "c": conf})
        if (doc_id + i) % 17 == 0:  # junk token the cleaner must drop
            words.append({"t": "|", "b": [x + w + 4, y, x + w + 12, y + 22], "c": 40.0})
        x += w + 10
        col += 1
        if col >= _WORDS_PER_LINE:
            col, x = 0, 60
            y += _LINE_GAP
    # printed-page header: arabic number in the top band
    words.append({"t": str(doc_id % 500 + 1), "b": [850, 30, 880, 52], "c": 90.0})
    return {
        "page_width": _PAGE_W,
        "page_height": _PAGE_H,
        "scan_relpath": f"doc_{doc_id:06d}.png",
        "words": words,
    }


def pages_from_documents(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) → pages(url, warc_ts,
    html, text, lang) — one Arrow-batched map stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, text, lang, source in zip(
                pdf["doc_id"], pdf["text"], pdf["lang"], pdf["source"]
            ):
                payload = _doc_payload(int(doc_id), text)
                # book granularity: source × 512-doc block — keeps the
                # per-book mode window wide enough to parallelize (real web
                # corpora have ~millions of hosts, never 5)
                book = f"{source}-{int(doc_id) // 512:05d}"
                out.append(
                    {
                        "url": f"https://docs.test/book_{book}/page_{int(doc_id):06d}",
                        "warc_ts": _EPOCH + pd.Timedelta(seconds=int(doc_id)),
                        "html": json.dumps(payload, ensure_ascii=False).encode("utf-8"),
                        "text": text,
                        "lang": lang,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in PAGES.fields])

    return docs.select("doc_id", "text", "lang", "source").mapInPandas(run, schema=PAGES)
