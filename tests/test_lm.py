"""KN-bigram LM perplexity: probability-mass sanity, quantized-integer
exactness between the python scorer, the Spark UDF and a DuckDB replay
of the literal model tables (the driver-oracle mechanism)."""

from __future__ import annotations

import math

import pytest

from ocr_obsidian_spark.operators.lm import (
    BOS,
    FIXTURE_LM,
    UNK,
    model_sql_tables,
    train_kn_bigram,
    with_lm_perplexity,
)


def test_distribution_sums_to_one_per_context():
    m = FIXTURE_LM
    events = m.vocab | {UNK}
    for u in [BOS, "the", "model", UNK]:
        tot = sum(10 ** (-m.token_cost(u, w) / 1e6) for w in events)
        assert abs(tot - 1.0) < 1e-3, (u, tot)


def test_training_is_deterministic():
    a, b = train_kn_bigram(), train_kn_bigram()
    assert a.bigram_lpm == b.bigram_lpm
    assert a.backoff_lpm == b.backoff_lpm
    assert a.cont_lpm == b.cont_lpm


def test_fluent_text_beats_junk():
    m = FIXTURE_LM
    _, fluent = m.doc_cost("the quick brown fox jumps over the lazy dog".split())
    _, junk = m.doc_cost("zxqv qqq wup zzz glorp aaa bbb ccc ddd".split())
    assert fluent < junk * 0.7


def test_seen_bigram_cheaper_than_backoff_path():
    m = FIXTURE_LM
    assert ("the", "quick") in m.bigram_lpm
    seen = m.token_cost("the", "quick")
    backoff = m.backoff_lpm["the"] + m.cont_lpm["quick"]
    assert seen < backoff


def test_no_singleton_bigram_corpus_trains_finite():
    # every bigram occurs >= 2 times -> n1 == 0; the absolute-discount
    # estimate would be D = 0 (lambda = 0, log10(0) crash) without the
    # neutral fallback
    m = train_kn_bigram(["a b a b a b", "a b a b a b"])
    n, cost = m.doc_cost("a b a".split())
    assert n == 3 and math.isfinite(cost)
    events = m.vocab | {UNK}
    tot = sum(10 ** (-m.token_cost("a", w) / 1e6) for w in events)
    assert abs(tot - 1.0) < 1e-3


def test_spark_udf_matches_python_scorer_exactly(spark):
    rows = [
        (1, "The quick   brown fox jumps over the lazy dog"),
        (2, "completely zxqv unknown glorp words here"),
        (3, ""),
        (4, None),
        (5, "the model was trained on a small corpus of english text"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["nll_micro"], r["lm_ppl"])
        for r in with_lm_perplexity(df).collect()
    }
    import re

    from ocr_obsidian_spark.operators.xengine import WS_RE

    for i, t in rows:
        norm = re.sub(WS_RE, " ", t or "").strip().lower()
        n, cost = FIXTURE_LM.doc_cost(norm.split(" ") if norm else [])
        assert got[i][0] == n and got[i][1] == cost, i
        if n == 0:
            assert got[i][2] is None
        else:
            assert math.isclose(got[i][2], 10 ** (cost / 1e6 / n))


def test_duckdb_replay_of_model_tables_is_exact():
    duckdb = pytest.importorskip("duckdb")
    t = model_sql_tables()
    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "unknown glorp zxqv tokens only"),
        (3, "a language model assigns a probability"),
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", docs)
    sql = f"""
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM d),
        tok AS (SELECT doc_id, i, ws[i] AS cur,
                       CASE WHEN i = 1 THEN '<s>' ELSE ws[i-1] END AS prev
                FROM (SELECT doc_id, ws,
                             unnest(generate_series(1, len(ws))) AS i FROM w)),
        m AS (SELECT doc_id, i,
                     coalesce(vc.tok, '<unk>') AS cur_m,
                     CASE WHEN prev = '<s>' THEN '<s>'
                          ELSE coalesce(vp.tok, '<unk>') END AS prev_m
              FROM tok
              LEFT JOIN {t['vocab']} AS vc(tok) ON tok.cur = vc.tok
              LEFT JOIN {t['vocab']} AS vp(tok) ON tok.prev = vp.tok),
        sc AS (SELECT doc_id,
                      coalesce(bg.lpm, up.bo_lpm + uc.cont_lpm) AS lpm
               FROM m
               LEFT JOIN {t['bigram']} AS bg(u, w, lpm)
                   ON m.prev_m = bg.u AND m.cur_m = bg.w
               JOIN {t['uni']} AS up(tok, bo_lpm, cont_lpm)
                   ON m.prev_m = up.tok
               JOIN {t['uni']} AS uc(tok, bo_lpm, cont_lpm)
                   ON m.cur_m = uc.tok)
        SELECT doc_id, count(*) AS n, CAST(sum(lpm) AS BIGINT) AS c
        FROM sc GROUP BY doc_id ORDER BY doc_id
    """
    got = {r[0]: (r[1], r[2]) for r in con.execute(sql).fetchall()}
    for i, text in docs:
        assert got[i] == FIXTURE_LM.doc_cost(text.split(" ")), i
