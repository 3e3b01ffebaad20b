"""Printed page-number detection: strict roman parsing + candidate ranking.

Semantics pinned to reference ingest/page_numbers.py:10-271. Detection is
fully page-local (runs inside the extract pandas UDF); only the arabic
mode-switch (ingest/page_numbers.py:274-294) crosses pages and is applied as
a Spark window in operators/printed_page.py.
"""

from __future__ import annotations

import re
from pathlib import PurePosixPath
from typing import Any

ROMAN_CHARS = frozenset("ivxlcdm")
ROMAN_VALUES = {"i": 1, "v": 5, "x": 10, "l": 50, "c": 100, "d": 500, "m": 1000}
_SUBTRACTIVE = frozenset({"iv", "ix", "xl", "xc", "cd", "cm"})
_ROMAN_STRICT = re.compile(r"^m{0,4}(cm|cd|d?c{0,3})(xc|xl|l?x{0,3})(ix|iv|v?i{0,3})$")
_ARABIC = re.compile(r"^\d{1,4}$")
_TERMINAL_ALNUM = re.compile(r"([A-Za-z0-9]+)[^A-Za-z0-9]*$")


def normalize_roman(s: str) -> str:
    """Keep only roman-numeral characters, lowercased."""
    return "".join(ch for ch in s.lower() if ch in ROMAN_CHARS)


def roman_to_int(s: str) -> int | None:
    """Strict roman parser: canonical-form regex + subtractive-pair check.

    Returns None for non-canonical forms like 'iix' or 'vx'
    (reference ingest/page_numbers.py:22-44).
    """
    norm = normalize_roman(s)
    if not norm or not _ROMAN_STRICT.fullmatch(norm):
        return None
    total, i = 0, 0
    while i < len(norm):
        cur = ROMAN_VALUES[norm[i]]
        if i + 1 < len(norm) and cur < ROMAN_VALUES[norm[i + 1]]:
            if norm[i : i + 2] not in _SUBTRACTIVE:
                return None
            total += ROMAN_VALUES[norm[i + 1]] - cur
            i += 2
        else:
            total += cur
            i += 1
    return total


def is_plausible_roman(s: str, *, min_len: int, max_value: int) -> bool:
    norm = normalize_roman(s)
    if len(norm) < max(1, int(min_len)):
        return False
    value = roman_to_int(norm)
    return value is not None and value <= int(max_value)


def infer_scan_side(scan_relpath: str) -> str:
    """Filename-stem suffix '_l'/'_r' → page side hint
    (reference ingest/page_numbers.py:57-63).

    Uses pathlib stem semantics exactly: the reference calls
    ``Path(scan_relpath).stem`` (PosixPath here), so trailing separators
    (``'x_L/'`` → stem ``'x_L'``) and trailing dots (``'a_l.'`` → stem
    ``'a_l.'``) must round-trip identically — a hand-rolled split diverges
    on both (caught by the round-2 hypothesis property test).
    """
    stem = PurePosixPath(scan_relpath).stem.lower()
    if stem.endswith("_l"):
        return "left"
    if stem.endswith("_r"):
        return "right"
    return "neutral"


def _center_norm(bbox: list[int], page_width: int, page_height: int) -> tuple[float, float]:
    w = max(1, int(page_width))
    h = max(1, int(page_height))
    return ((bbox[0] + bbox[2]) / 2.0 / w, (bbox[1] + bbox[3]) / 2.0 / h)


def _preferred(x_norm: float, side: str) -> bool:
    if side == "left":
        return x_norm < 0.35
    if side == "right":
        return x_norm > 0.65
    return True


def _edge_score(x_norm: float, side: str) -> float:
    if side == "left":
        return 1.0 - x_norm
    if side == "right":
        return x_norm
    return max(x_norm, 1.0 - x_norm)


def _sort_key(c: dict[str, Any]) -> tuple:
    """Total-order ranking key — every field participates so ties are
    impossible and the selection is deterministic under any parallelism
    (reference ingest/page_numbers.py:125-135)."""
    return (
        0 if c["_preferred"] else 1,
        -float(c["_edge_score"]),
        -float(c["conf"]),
        float(c["y_center_norm"]),
        str(c["text"]),
        "" if c.get("line_id") is None else str(c["line_id"]),
        str(c["source"]),
        tuple(int(v) for v in c["bbox"]),
    )


def _mk_candidate(
    text: str,
    conf: float,
    bbox: list[int],
    source: str,
    line_id: str | None,
    page_width: int,
    page_height: int,
    side: str,
) -> dict[str, Any]:
    x_norm, y_norm = _center_norm(bbox, page_width, page_height)
    return {
        "text": text,
        "conf": float(conf),
        "bbox": [int(b) for b in bbox],
        "x_center_norm": x_norm,
        "y_center_norm": y_norm,
        "source": source,
        "line_id": line_id,
        "_preferred": _preferred(x_norm, side),
        "_edge_score": _edge_score(x_norm, side),
    }


def _terminal_token(line: dict[str, Any]) -> str | None:
    """Last word's text, else trailing alnum run of the line text
    (reference ingest/page_numbers.py:90-96)."""
    words = line.get("words") or []
    if words:
        return str(words[-1].get("text", ""))
    m = _TERMINAL_ALNUM.search(str(line.get("text", "")).strip())
    return m.group(1) if m else None


def _strip_internal(c: dict[str, Any]) -> dict[str, Any]:
    """Drop ranking-internal fields from a debug candidate (reference
    ingest/page_numbers.py:138-142 — note `_roman_value` deliberately
    survives, matching the reference)."""
    out = dict(c)
    out.pop("_preferred", None)
    out.pop("_edge_score", None)
    return out


def detect_printed_page(
    words: list[dict[str, Any]],
    lines: list[dict[str, Any]],
    *,
    page_width: int,
    page_height: int,
    top_band_frac: float = 0.12,
    min_conf: float = 40.0,
    roman_min_len: int = 2,
    roman_max_value: int = 80,
    side: str = "neutral",
    max_top_lines: int = 5,
    debug: bool = False,
) -> dict[str, Any]:
    """Rank top-band word and line-terminal candidates, prefer arabic over
    roman, return {printed_page, printed_page_text, printed_page_kind}
    (reference ingest/page_numbers.py:145-271).

    ``debug=True`` adds a ``debug`` key holding the reference's
    deterministic debug payload (page_numbers.py:226,259): the selected
    candidate (internal ranking fields stripped), its kind, and the top-10
    ranked candidates per family — run-to-run identical by construction
    (the sort key is a total order).
    """
    band_limit = max(0.0, float(top_band_frac)) * max(1, int(page_height))
    min_confidence = float(min_conf)
    cands: list[dict[str, Any]] = []

    # inlined _center_norm y-path (identical float ops: /2.0 then /h, then
    # *page_height) — the x half and the call/tuple overhead are dead
    # weight for this every-word band filter
    _h = max(1, int(page_height))
    for w in words:
        bbox = w["bbox"]
        y_norm = (bbox[1] + bbox[3]) / 2.0 / _h
        if (y_norm * page_height) > band_limit:
            continue
        cands.append(
            _mk_candidate(
                str(w.get("text", "")), float(w.get("confidence", 0.0)), w["bbox"],
                "word", None, page_width, page_height, side,
            )
        )

    ordered_lines = sorted(
        lines,
        key=lambda ln: (
            _center_norm(ln["bbox"], page_width, page_height)[1],
            ln["bbox"][0],
            ln["line_id"],
        ),
    )
    for ln in ordered_lines[: max(0, int(max_top_lines))]:
        _, y_norm = _center_norm(ln["bbox"], page_width, page_height)
        if (y_norm * page_height) > band_limit:
            continue
        token = _terminal_token(ln)
        if not token:
            continue
        line_words = ln.get("words") or []
        conf = float(line_words[-1].get("confidence", 0.0)) if line_words else 0.0
        cands.append(
            _mk_candidate(
                token, conf, ln["bbox"], "line", str(ln["line_id"]),
                page_width, page_height, side,
            )
        )

    arabic = [
        c for c in cands
        if c["conf"] >= min_confidence and _ARABIC.fullmatch(str(c["text"]))
    ]
    if arabic:
        if debug:
            ranked = sorted(arabic, key=_sort_key)
            best = ranked[0]
        else:
            best = min(arabic, key=_sort_key)
        result = {
            "printed_page": int(str(best["text"])),
            "printed_page_text": str(best["text"]),
            "printed_page_kind": "arabic",
        }
        if debug:
            result["debug"] = {
                "selected": _strip_internal(best),
                "selected_kind": "arabic",
                "arabic_top_candidates": [_strip_internal(c) for c in ranked[:10]],
                "roman_top_candidates": [],
            }
        return result

    romans: list[dict[str, Any]] = []
    for c in cands:
        if c["conf"] < min_confidence:
            continue
        norm = normalize_roman(str(c["text"]))
        if len(norm) < int(roman_min_len):
            continue
        value = roman_to_int(norm)
        if value is None or value > int(roman_max_value):
            continue
        romans.append({**c, "_roman_value": value})
    if romans:
        if debug:
            ranked = sorted(romans, key=_sort_key)
            best = ranked[0]
        else:
            best = min(romans, key=_sort_key)
        result = {
            "printed_page": int(best["_roman_value"]),
            "printed_page_text": str(best["text"]),
            "printed_page_kind": "roman",
        }
        if debug:
            result["debug"] = {
                "selected": _strip_internal(best),
                "selected_kind": "roman",
                "arabic_top_candidates": [],
                "roman_top_candidates": [_strip_internal(c) for c in ranked[:10]],
            }
        return result

    result = {"printed_page": None, "printed_page_text": None, "printed_page_kind": None}
    if debug:
        result["debug"] = {
            "selected": None,
            "selected_kind": None,
            "arabic_top_candidates": [],
            "roman_top_candidates": [],
        }
    return result
