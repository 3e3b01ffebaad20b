"""Deterministic synthetic web-page corpus (FIXTURES.md §1/§5).

Generates Common-Crawl-shaped rows ``(url, warc_ts, html, text, lang)`` where
``html`` is the UTF-8 JSON serialization of a synthetic "scanned page" token
stream — the stand-in for Tesseract output (reference ingest/ocr.py:46-79).
The byte stream deliberately contains every adversarial cleanup pattern the
reference's unit tests pin (FIXTURES.md §5): pipe junk, hyphen line-breaks,
lowercase reflow, low-confidence spew, list lines, roman/arabic headers, the
arabic mode-switch sequence, garbage pages, empty pages, Unicode alpha text,
and token-count skew.

Everything is seeded and byte-stable: per-page RNGs are derived as
``random.Random(f"{seed}/{book}/{page}")`` (str seeding uses sha512 — not the
salted builtin hash), so regeneration is identical across processes and
executors.
"""

from __future__ import annotations

import json
import random
from datetime import datetime, timedelta, timezone
from typing import Any

_EPOCH = datetime(2020, 1, 1, tzinfo=timezone.utc)

_VOCAB = (
    "the quick brown fox jumps over a lazy dog while reading ancient texts "
    "about philosophy history science letters kingdoms rivers mountains "
    "merchants voyages treaties harvest winter summer council chapter verse"
).split()

_UNICODE_WORDS = ["café", "naïve", "Σοφία", "Müller", "résumé", "Kraków"]

PAGE_WIDTH = 1000
PAGE_HEIGHT = 1400
_LINE_H = 22
_LINE_GAP = 40
_BODY_Y0 = 220  # below the printed-page top band (0.12 * 1400 = 168)


def _word(text: str, x: int, y: int, conf: float) -> dict[str, Any]:
    w = max(8, 11 * len(text))
    return {"t": text, "b": [x, y, x + w, y + _LINE_H], "c": round(conf, 1)}


class _PageBuilder:
    def __init__(self) -> None:
        self.words: list[dict[str, Any]] = []
        self.y = _BODY_Y0

    def header(self, text: str, conf: float, x_frac: float) -> None:
        x = int(PAGE_WIDTH * x_frac)
        self.words.append(_word(text, x, 30, conf))

    def line(self, tokens: list[tuple[str, float]]) -> None:
        x = 60
        for text, conf in tokens:
            w = _word(text, x, self.y, conf)
            self.words.append(w)
            x = w["b"][2] + 10
        self.y += _LINE_GAP


def _sentence(rng: random.Random, n: int, conf: float = 95.0) -> list[tuple[str, float]]:
    toks = [(rng.choice(_VOCAB), conf + rng.uniform(-3, 3)) for _ in range(n)]
    last_t, last_c = toks[-1]
    toks[-1] = (last_t + ".", last_c)
    toks[0] = (toks[0][0].capitalize(), toks[0][1])
    return toks


def _body_lines(pb: _PageBuilder, rng: random.Random, n_lines: int) -> None:
    """Cycle through the adversarial line types (FIXTURES.md §5 #1-#6, #13)."""
    kind = 0
    produced = 0
    while produced < n_lines:
        kind = (kind + 1) % 8
        if kind == 1:  # hyphen break pair (joins to 'condemned...')
            pb.line(_sentence(rng, 4)[:-1] + [("con-", 96.0)])
            pb.line([("demned", 95.0)] + _sentence(rng, 4))
            produced += 2
        elif kind == 2:  # lowercase continuation (no strong break before it)
            head = _sentence(rng, 6)
            head[-1] = (head[-1][0].rstrip("."), head[-1][1])
            pb.line(head)
            pb.line([("and", 94.0)] + _sentence(rng, 5))
            produced += 2
        elif kind == 3:  # list line — must not reflow
            pb.line([("-", 95.0), ("item", 95.0), (rng.choice(_VOCAB), 95.0)])
            produced += 1
        elif kind == 4:  # junk: pipes, lone symbols, low-conf short alpha
            pb.line(
                _sentence(rng, 3)
                + [("|", 90.0), ("||", 40.0), (")", 88.0), ("zq", 30.0)]
            )
            produced += 1
        elif kind == 5:  # low-conf spew tokens
            pb.line(_sentence(rng, 4) + [("fi", 60.0), ("i|", 50.0), ("th!", 70.0)])
            produced += 1
        elif kind == 6:  # unicode alpha text
            pb.line([(w, 93.0) for w in rng.sample(_UNICODE_WORDS, 3)] + [("done.", 95.0)])
            produced += 1
        elif kind == 7:  # numbered list variant
            pb.line([(str(1000 + rng.randrange(9000)), 92.0), ("entry", 94.0)])
            produced += 1
        else:
            pb.line(_sentence(rng, rng.randrange(5, 10)))
            produced += 1


_ROMANS = ["ii", "iii", "iv", "ix", "xiv", "xix", "xxi", "xxxv", "xl", "lx"]


def _apply_header(pb: _PageBuilder, rng: random.Random, book_idx: int, page_num: int) -> None:
    """Printed-page header patterns (FIXTURES.md §5 #7-#9)."""
    if book_idx == 0:
        # fixed mode-switch scenario (reference ingest/page_numbers.py:274-294):
        # romans, then arabic < switch, then arabic >= switch, then a roman
        # that must be nulled, then arabic again.
        script = {
            1: ("ix", 90.0, 0.85),
            2: ("x", 90.0, 0.85),
            3: ("3", 91.0, 0.85),
            4: ("12", 92.0, 0.85),
            5: ("xx", 90.0, 0.85),  # nulled by the mode switch
            6: ("14", 93.0, 0.85),
        }
        if page_num in script:
            pb.header(*script[page_num])
        elif page_num % 3 != 0:
            pb.header(str(page_num + 10), 90.0 + rng.uniform(0, 5), 0.85)
        return

    h = page_num % 7
    if h == 1:
        pb.header(str(page_num), 88.0, 0.85)
    elif h == 2:
        pb.header(_ROMANS[page_num % len(_ROMANS)], 86.0, 0.1)
    elif h == 3:
        pb.header("iix", 90.0, 0.1)  # invalid roman — must be ignored
    elif h == 4:
        pb.header(str(page_num), 80.0, 0.08)  # duplicate number, both sides:
        pb.header(str(page_num), 80.0, 0.88)  # side preference decides
    elif h == 5:
        pb.header(str(page_num), 30.0, 0.85)  # below min_conf — ignored
    elif h == 6:
        pb.header("m", 90.0, 0.1)  # single roman char — below roman_min_len


# highlight-stroke HSV colors, all inside the detection range
# ([15,20,80]..[95,255,255], reference ingest/highlights.py:98-99)
_HL_HSV = [(40, 120, 200), (25, 180, 230), (60, 90, 160), (85, 200, 240)]


def _stroke(bbox: list[int], hsv: tuple[int, int, int]) -> dict[str, Any]:
    return {"bbox": bbox, "hsv": list(hsv)}


def _page_strokes(b: int, p: int, seed: int) -> list[dict[str, Any]]:
    """The page's highlight-ink layer (FIXTURES.md §3 — detection form).

    Consumes the SAME rng stream as fixture_trigger_rows, so the
    line-overlapping strokes rasterize to exactly the candidate bboxes the
    legacy trigger fixtures supply; on top of those it layers every
    adversarial detection case: a sub-min-area blob, an out-of-HSV-range
    stroke, a frame-margin stripe (pixel-space truncation), a near-edge
    shape-reject block, a sub-kernel gap pair that morphology-close must
    merge, and opening-removable speckles. Text ink is deliberately not
    painted: it sits outside the highlight HSV range, so the mask would
    drop it anyway (reference ingest/highlights.py:115-116).
    """
    rng = random.Random(f"trig/{seed}/{b}/{p}")
    strokes: list[dict[str, Any]] = []
    n = p % 4
    for k in range(n):
        line_idx = rng.randrange(0, 6)
        y0 = _BODY_Y0 + line_idx * _LINE_GAP - 4
        x0 = 80 + rng.randrange(0, 200)
        bbox = [x0, y0, x0 + 260, y0 + _LINE_H + 8]
        strokes.append(_stroke(bbox, _HL_HSV[(p + k) % 4]))
        if k == 0 and p % 5 == 0:  # overlapping duplicate → one merged component
            strokes.append(
                _stroke([x0 + 15, y0 + 2, x0 + 275, y0 + _LINE_H + 10], _HL_HSV[(p + 1) % 4])
            )
    if p % 6 == 0:
        # vertical stripe inside the frame-crop margin (pixel-space zeroing
        # truncates it) and a near-edge block the shape gate must reject
        strokes.append(_stroke([2, 150, 22, 900], (20, 150, 200)))
        strokes.append(_stroke([4, 300, 80, 460], (30, 140, 210)))
    if p % 3 == 0:
        strokes.append(_stroke([600, 150, 610, 160], (45, 130, 220)))  # area 100 < 120
    if p % 7 == 0:
        strokes.append(_stroke([500, 60, 620, 100], (110, 180, 220)))  # hue 110 > 95
    if p % 9 == 0:
        # 4 px gap — a 5×5 close must bridge it into one component
        strokes.append(_stroke([300, 1160, 360, 1190], (35, 110, 190)))
        strokes.append(_stroke([364, 1160, 420, 1190], (35, 110, 190)))
    srng = random.Random(f"spk/{seed}/{b}/{p}")
    for _ in range(srng.randrange(3, 7)):  # 1-2 px speckles, opening removes
        x = srng.randrange(60, 940)
        y = srng.randrange(1250, 1380)
        strokes.append(
            _stroke([x, y, x + srng.choice([1, 2]), y + srng.choice([1, 2])], (50, 150, 210))
        )
    return strokes


def _garbage_page(pb: _PageBuilder, rng: random.Random) -> None:
    for _ in range(6):
        pb.line(
            [("|" * rng.randrange(1, 4), 20.0 + rng.uniform(0, 20)) for _ in range(8)]
            + [("\\x" + str(rng.randrange(10)), 35.0)]
        )


def book_id_for(book_idx: int) -> str:
    return f"b{book_idx:02d}"


def url_for(book_idx: int, page_num: int) -> str:
    return f"https://fixture.test/book_{book_id_for(book_idx)}/page_{page_num:04d}"


def _scan_relpath(book_idx: int, page_num: int) -> str:
    # book 1 alternates _l/_r stems to exercise infer_scan_side
    # (reference ingest/page_numbers.py:57-63); others are neutral.
    if book_idx == 1:
        side = "_l" if page_num % 2 == 1 else "_r"
        return f"scan_{page_num:04d}{side}.png"
    return f"scan_{page_num:04d}.png"


def fixture_page_rows(
    n_books: int = 3, pages_per_book: int = 18, seed: int = 42, skew_factor: int = 60
) -> list[dict[str, Any]]:
    """Rows for the ``pages`` input table (FIXTURES.md §1)."""
    rows: list[dict[str, Any]] = []
    global_idx = 0
    for b in range(n_books):
        for p in range(1, pages_per_book + 1):
            rng = random.Random(f"{seed}/{b}/{p}")
            pb = _PageBuilder()
            if p % 13 == 0:
                pass  # empty page: no words at all (FIXTURES.md §5 #14)
            elif p % 11 == 0:
                _garbage_page(pb, rng)  # QA-gate page (#11)
            else:
                _apply_header(pb, rng, b, p)
                n_lines = rng.randrange(6, 12)
                if b == 0 and p == pages_per_book:
                    n_lines *= skew_factor  # skew tail page (#15)
                _body_lines(pb, rng, n_lines)

            payload = {
                "page_width": PAGE_WIDTH,
                "page_height": PAGE_HEIGHT,
                "scan_relpath": _scan_relpath(b, p),
                "words": pb.words,
                "strokes": _page_strokes(b, p, seed),
            }
            raw_text = "\n".join(
                " ".join(w["t"] for w in pb.words if w["b"][1] == y)
                for y in sorted({w["b"][1] for w in pb.words})
            )
            rows.append(
                {
                    "url": url_for(b, p),
                    "warc_ts": _EPOCH + timedelta(minutes=global_idx),
                    "html": json.dumps(payload, ensure_ascii=False).encode("utf-8"),
                    "text": raw_text,
                    "lang": "eng",
                }
            )
            global_idx += 1
    return rows


def fixture_trigger_rows(
    n_books: int = 3, pages_per_book: int = 18, seed: int = 42
) -> list[dict[str, Any]]:
    """Raw block-candidate rows (pre-shape-filter highlight analog,
    FIXTURES.md §3): per page 0-3 candidates — line-overlapping boxes, a
    tall/skinny near-edge stripe (must be shape-filtered out), and duplicate
    overlapping boxes that exercise the span merge path (#10, #12)."""
    rows: list[dict[str, Any]] = []
    for b in range(n_books):
        for p in range(1, pages_per_book + 1):
            rng = random.Random(f"trig/{seed}/{b}/{p}")
            cands: list[dict[str, Any]] = []
            n = p % 4
            for k in range(n):
                line_idx = rng.randrange(0, 6)
                y0 = _BODY_Y0 + line_idx * _LINE_GAP - 4
                x0 = 80 + rng.randrange(0, 200)
                bbox = [x0, y0, x0 + 260, y0 + _LINE_H + 8]
                cands.append(
                    {
                        "bbox": bbox,
                        "area": (bbox[2] - bbox[0]) * (bbox[3] - bbox[1]),
                        "color_stats": {"h_mean": 40.0, "s_mean": 120.0, "v_mean": 200.0},
                    }
                )
                if k == 0 and p % 5 == 0:  # overlapping duplicate → merge (#12)
                    dup = [x0 + 15, y0 + 2, x0 + 275, y0 + _LINE_H + 10]
                    cands.append(
                        {
                            "bbox": dup,
                            "area": (dup[2] - dup[0]) * (dup[3] - dup[1]),
                            "color_stats": {"h_mean": 41.0, "s_mean": 121.0, "v_mean": 201.0},
                        }
                    )
            if p % 6 == 0:  # vertical stripe near the left edge (#10)
                cands.append(
                    {
                        "bbox": [2, 150, 22, 900],
                        "area": 20 * 750,
                        "color_stats": {"h_mean": 10.0, "s_mean": 50.0, "v_mean": 90.0},
                    }
                )
            if cands:
                rows.append({"url": url_for(b, p), "candidates": cands})
    return rows


def parse_page_payload(html: bytes) -> dict[str, Any]:
    """Decode the synthetic page byte stream back into the token payload.

    The tokenizer's admission filter is applied downstream (operators/extract);
    this is pure decode (stand-in for the binary→words OCR boundary,
    reference ingest/ocr.py:46-52).
    """
    return json.loads(bytes(html).decode("utf-8"))
