"""Per-page / per-span text-quality metrics and the garbage gate.

Semantics pinned to reference ingest/qa_metrics.py:30-108. Runs inside the
extract/emit pandas UDFs; the gate decides between rendered text and the
low-quality placeholder (reference ingest/cli.py:185-191,
ingest/emit_obsidian.py:273-274).
"""

from __future__ import annotations

from typing import Any

import re

from ..config import QaThresholds

_ALPHA_ASCII = re.compile(r"[A-Za-z]+")
_ALNUM_ASCII = re.compile(r"[A-Za-z0-9]+")
# exactly the ASCII chars for which str.isspace() is True
_SPACE_ASCII = re.compile(r"[ \t\n\r\x0b\x0c\x1c\x1d\x1e\x1f]+")


def _line_display_text(line: dict[str, Any]) -> str:
    """Line text for metric purposes: joined non-blank word texts, else the
    raw ``text`` field (reference ingest/qa_metrics.py:30-35)."""
    words = line.get("words")
    if isinstance(words, (list, tuple)) and len(words) > 0:
        parts = []
        for w in words:
            t = str(w.get("text", ""))
            if t.strip():
                parts.append(t)
        return " ".join(parts).strip()
    return str(line.get("text", "")).strip()


def compute_text_metrics(
    lines: list[dict[str, Any]], *, trusted_line_text: bool = False
) -> dict[str, Any]:
    """char/line counts, confidence mean, alpha/garbage/pipe ratios
    (reference ingest/qa_metrics.py:38-78).

    Note alpha_ratio here is alpha/ALNUM (not alpha/len as in the token-level
    cleanup) — the two definitions intentionally differ in the reference.

    ``trusted_line_text=True`` skips the per-word display-text rebuild and
    reads ``line["text"]`` directly. ONLY valid for group_lines output,
    where it is provably identical: every admitted word's text is
    non-empty after strip (admit_word) and stored pre-stripped
    (extract.py), so _line_display_text's non-blank filter keeps all of
    them and the join has no edge whitespace to strip — the property test
    pins this equivalence over generated corpora.
    """
    texts: list[str] = []
    confs: list[float] = []
    for line in lines:
        text = line["text"] if trusted_line_text else _line_display_text(line)
        if not text:
            continue
        texts.append(text)
        words = line.get("words")
        if isinstance(words, (list, tuple)):
            for w in words:
                try:
                    c = float(w.get("confidence"))
                except (TypeError, ValueError):
                    continue
                if c >= 0:
                    confs.append(c)

    content = "\n".join(texts)
    if content.isascii():
        # ASCII fast path: for ASCII input, str.isalpha == [A-Za-z],
        # str.isalnum == [A-Za-z0-9], and str.isspace == the explicit set
        # in _SPACE_ASCII (incl. \x1c-\x1f separators) — regex deletions
        # give counts bit-identical to the per-char loop; alnum chars are
        # never whitespace so garbage = nonspace - alnum
        n = len(content)
        alpha = n - len(_ALPHA_ASCII.sub("", content))
        alnum = n - len(_ALNUM_ASCII.sub("", content))
        nonspace = len(_SPACE_ASCII.sub("", content))
        garbage = nonspace - alnum
    else:
        alpha = alnum = nonspace = garbage = 0
        for ch in content:
            a = ch.isalnum()
            s = ch.isspace()
            if ch.isalpha():
                alpha += 1
            if a:
                alnum += 1
            if not s:
                nonspace += 1
                if not a:
                    garbage += 1
    pipes = content.count("|")

    return {
        "char_count": len(content),
        "line_count": len(texts),
        "avg_word_conf": (sum(confs) / len(confs)) if confs else None,
        "alpha_ratio": (alpha / alnum) if alnum else 0.0,
        "garbage_ratio": (garbage / nonspace) if nonspace else 0.0,
        "pipe_ratio": (pipes / nonspace) if nonspace else 0.0,
    }


def is_garbage_page(metrics: dict[str, Any], thresholds: QaThresholds | None = None) -> bool:
    """Empty-or-garbage gate (reference ingest/qa_metrics.py:81-108)."""
    t = thresholds or QaThresholds()
    char_count = int(metrics.get("char_count", 0))
    line_count = int(metrics.get("line_count", 0))
    alpha_ratio = float(metrics.get("alpha_ratio", 0.0))
    garbage_ratio = float(metrics.get("garbage_ratio", 0.0))
    pipe_ratio = float(metrics.get("pipe_ratio", 0.0))
    avg_conf = metrics.get("avg_word_conf")

    if line_count == 0 or char_count == 0:
        return True
    if char_count < 12 and alpha_ratio < 0.35:
        return True
    if pipe_ratio > t.max_pipe_ratio and alpha_ratio < t.min_alpha_ratio:
        return True
    if garbage_ratio > t.max_garbage_ratio and alpha_ratio < t.min_alpha_ratio:
        return True
    if (
        avg_conf is not None
        and float(avg_conf) < t.min_avg_word_conf
        and garbage_ratio > t.max_garbage_ratio * 0.75
    ):
        return True
    return False


def low_quality_placeholder(metrics: dict[str, Any], scan_relpath: str) -> str:
    """Placeholder text substituted for garbage pages
    (reference ingest/emit_obsidian.py:136-140, cli.py:185-191)."""
    avg_conf = metrics.get("avg_word_conf")
    conf_text = "n/a" if avg_conf is None else f"{float(avg_conf):.1f}"
    garbage = float(metrics.get("garbage_ratio", 0.0))
    return (
        f"OCR LOW QUALITY (avg_conf={conf_text}, garbage={garbage:.3f}). "
        f"See scan: {scan_relpath}"
    )
