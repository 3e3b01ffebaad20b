"""Cross-document repeated-substring removal: planted-passage semantics,
a brute-force pure-Python oracle fuzz, and the coverage guarantee of the
shingle-anchor approximation."""

from __future__ import annotations

import hashlib
import random
import re

import pytest

from ocr_obsidian_spark.operators.substrdedup import drop_duplicated_substrings

WIDTH = 5


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = drop_duplicated_substrings(df, width=kw.pop("width", WIDTH), **kw)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def _oracle(rows, width=WIDTH, min_docs=2):
    """Brute-force reimplementation: mark every word position covered by a
    width-gram whose normalized form occurs in >= min_docs distinct docs."""
    norm = {
        i: re.sub(r"\s+", " ", (t or "")).strip().lower().split(" ")
        if (t or "").strip()
        else []
        for i, t in rows
    }
    seen: dict[str, set[int]] = {}
    for i, ws in norm.items():
        for p in range(len(ws) - width + 1):
            seen.setdefault(" ".join(ws[p : p + width]), set()).add(i)
    dup = {g for g, docs in seen.items() if len(docs) >= min_docs}
    out = {}
    for i, ws in norm.items():
        cov = set()
        for p in range(len(ws) - width + 1):
            if " ".join(ws[p : p + width]) in dup:
                cov.update(range(p, p + width))
        kept = [w for j, w in enumerate(ws) if j not in cov]
        out[i] = {
            "doc_id": i,
            "text": " ".join(kept),
            "n_words_kept": len(kept),
            "n_words_dropped": len(ws) - len(kept),
        }
    return out


def test_planted_shared_passage_removed_everywhere(spark):
    shared = "alpha beta gamma delta epsilon"
    rows = [
        (1, f"intro words here {shared} outro"),
        (2, f"{shared} second document body"),
        (3, "independent text that survives whole"),
    ]
    got = _run(spark, rows)
    assert got[1]["text"] == "intro words here outro"
    assert got[2]["text"] == "second document body"
    assert got[3]["n_words_dropped"] == 0
    assert got[1]["n_words_dropped"] == 5 and got[2]["n_words_dropped"] == 5


def test_below_width_share_is_not_removed(spark):
    rows = [(1, "one two three four tail-a"), (2, "one two three four tail-b")]
    got = _run(spark, rows)  # shared run = 4 words < width
    assert got[1]["n_words_dropped"] == 0 and got[2]["n_words_dropped"] == 0


def test_intra_doc_repeat_alone_does_not_trigger(spark):
    p = "alpha beta gamma delta epsilon"
    rows = [(1, f"{p} middle {p}"), (2, "unrelated other words entirely here")]
    got = _run(spark, rows)  # min_docs counts DISTINCT docs
    assert got[1]["n_words_dropped"] == 0


def test_long_passage_fully_covered(spark):
    # coverage guarantee: a shared passage of >= 2*width-1 words is fully
    # excised (every word sits inside some aligned duplicate shingle)
    passage = " ".join(f"w{i}" for i in range(2 * WIDTH - 1))
    rows = [(1, f"head {passage} tail"), (2, f"{passage} other body text")]
    got = _run(spark, rows)
    assert got[1]["text"] == "head tail"
    assert got[2]["text"] == "other body text"


def test_whole_doc_duplicate_becomes_empty(spark):
    t = "exact duplicate document body of six"
    got = _run(spark, [(1, t), (2, t)])
    assert got[1]["text"] == "" and got[2]["text"] == ""
    assert got[1]["n_words_kept"] == 0


def test_null_and_empty_are_stable(spark):
    got = _run(spark, [(1, None), (2, ""), (3, "   ")])
    for i in (1, 2, 3):
        assert got[i]["text"] == ""
        assert got[i]["n_words_kept"] == 0 and got[i]["n_words_dropped"] == 0


def test_min_docs_three(spark):
    p = "alpha beta gamma delta epsilon"
    rows = [(1, f"{p} one"), (2, f"{p} two"), (3, f"{p} three")]
    assert _run(spark, rows, min_docs=3)[1]["text"] == "one"
    assert _run(spark, [r for r in rows[:2]], min_docs=3)[1]["n_words_dropped"] == 0


def test_fuzz_against_bruteforce_oracle(spark):
    rng = random.Random(97)
    vocab = [f"t{i}" for i in range(12)]
    passages = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(WIDTH, 2 * WIDTH + 2)))
        for _ in range(4)
    ]
    rows = []
    for i in range(24):
        parts = []
        for _ in range(rng.randint(0, 4)):
            parts.append(
                rng.choice(passages)
                if rng.random() < 0.5
                else " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 9)))
            )
        rows.append((i, "  ".join(parts)))
    got = _run(spark, rows)
    want = _oracle(rows)
    assert got == want


def test_xxhash64_production_anchor_matches_md5_twin(spark):
    """anchor_hash only changes the shuffle key width, never the
    result (the simhash64 / simhash64_md5 precedent)."""
    rng = random.Random(41)
    vocab = [f"w{i}" for i in range(10)]
    passage = " ".join(rng.choice(vocab) for _ in range(WIDTH + 3))
    rows = [
        (i, f"{passage} doc {i} " + " ".join(rng.choice(vocab) for _ in range(6)))
        for i in range(12)
    ]
    assert _run(spark, rows, anchor_hash="xxhash64") == _run(
        spark, rows, anchor_hash="md5"
    )


def test_normalization_collides_case_and_whitespace(spark):
    rows = [
        (1, "Alpha  Beta\tGAMMA delta Epsilon plus"),
        (2, "alpha beta gamma delta epsilon minus"),
    ]
    got = _run(spark, rows)
    assert got[1]["text"] == "plus" and got[2]["text"] == "minus"
