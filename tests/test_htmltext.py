"""HTML main-content extraction (operators/htmltext.py)."""

from __future__ import annotations

import pytest

from ocr_obsidian_spark.operators.htmltext import extract_main_content, html_blocks

PAGE = (
    "<html><head><title>t</title><style>p{color:red}</style>"
    "<script>var x = '<p>not text</p>';</script></head><body>"
    "<nav><a href='/'>Home</a> <a href='/a'>About</a> <a href='/c'>Contact</a></nav>"
    "<h1>The Article &amp; Its Title</h1>"
    "<p>This is the first real paragraph of the article, long enough to keep "
    "and containing a single <a href='/ref'>inline link</a> among many words.</p>"
    "<p>Second paragraph with an entity: 3 &lt; 5 &amp;&nbsp;done.</p>"
    "<!-- a comment with <p>markup</p> inside -->"
    "<footer><a href='/tos'>Terms</a> <a href='/priv'>Privacy</a></footer>"
    "</body></html>"
)


def test_html_blocks_features(spark):
    df = spark.createDataFrame([(1, PAGE)], "doc_id long, html_str string")
    rows = html_blocks(df).collect()
    by_text = {r["block_text"]: r for r in rows}
    # script/style/comment content never surfaces
    assert not any("color:red" in t or "not text" in t or "comment" in t for t in by_text)
    nav = by_text["Home About Contact"]
    # 16 of 18 visible chars are anchor text (the separators are not)
    assert nav["link_density"] > 0.8 and not nav["is_content"]
    title = by_text["The Article & Its Title"]
    assert title["link_chars"] == 0
    body = next(t for t in by_text if t.startswith("This is the first"))
    assert by_text[body]["is_content"]
    assert 0.0 < by_text[body]["link_density"] < 0.2
    ent = next(t for t in by_text if "3 < 5" in t)
    assert "& done" in ent  # &amp;&nbsp; → '& '


def test_extract_main_content(spark):
    df = spark.createDataFrame(
        [(1, PAGE), (2, "<nav><a href='/'>Only Nav</a></nav>"), (3, None)],
        "doc_id long, html_str string",
    )
    out = {r["doc_id"]: r for r in extract_main_content(df).collect()}
    main = out[1]["main_text"]
    assert main.startswith("This is the first real paragraph")
    assert "Second paragraph" in main
    assert "Home About" not in main and "Terms" not in main
    assert "\n\n" in main  # blocks joined with blank lines
    assert out[1]["n_blocks_dropped"] >= 3  # nav, title(<25 chars ok?), footer
    assert out[2]["main_text"] == "" and out[2]["n_blocks_kept"] == 0
    assert out[3]["main_text"] == "" and out[3]["n_blocks_dropped"] == 0
    assert set(out) == {1, 2, 3}


def test_entity_double_escape(spark):
    # '&amp;lt;' is the LITERAL text '&lt;' — must not double-decode to '<'
    df = spark.createDataFrame(
        [(1, "<p>uses &amp;lt; to show a less-than sign in markup docs</p>")],
        "doc_id long, html_str string",
    )
    [r] = html_blocks(df).collect()
    assert "&lt;" in r["block_text"] and "<" not in r["block_text"].replace("&lt;", "")
