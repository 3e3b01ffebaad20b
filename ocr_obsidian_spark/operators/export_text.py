"""Book-text export: corpus → one concatenated text/markdown document per
book (reference ingest/cli.py:162-215, run_export_book_text).

Pure relational, byte-exact to the reference's part-join semantics:

  txt:  parts = [strip(f"# Page {page_num}\\n{page_text}")] per page
  md:   parts = [strip(f"# {title}"), ""] then per page
        [rstrip(f"## Page {display} (scan: ...)"), strip(page_text), "---", ""]
  file  content = strip("\\n\\n".join(parts)) + "\\n"     (cli.py:209)

The empty separator elements ("" parts) are emitted literally — they yield
the reference's 4-newline gaps after the md title and between md sections.
``strip`` means Python ``str.strip()`` (all whitespace, not just spaces);
realized as a Unicode-class regexp, not ``F.trim``.

The per-page text/gate/placeholder decision already lives in the corpus
(``extracted_text``); display page prefers the detected printed page
(cli.py:178-183).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _pystrip(c: Column) -> Column:
    """Python ``str.strip()`` semantics (all leading/trailing whitespace)."""
    return F.regexp_replace(c, r"(?U)^\s+|\s+$", "")


def export_book_text(corpus: DataFrame, *, fmt: str = "txt", title: str | None = None) -> DataFrame:
    """(book_id, content) — ``fmt`` is 'txt' or 'md' (reference cli.py:173-209)."""
    page_text = F.coalesce(F.col("extracted_text"), F.lit(""))
    if fmt == "md":
        display_page = F.coalesce(
            F.col("printed_page").cast("string"), F.col("page_num").cast("string")
        )
        header = F.concat(
            F.lit("## Page "), display_page,
            F.lit(" (scan: "), F.coalesce(F.col("scan_relpath"), F.lit("")), F.lit(")"),
        )
        # reference appends 4 parts per page: header.rstrip(), text.strip(),
        # "---", "" (cli.py:196-200)
        parts = F.array(
            F.regexp_replace(header, r"(?U)\s+$", ""),
            _pystrip(page_text),
            F.lit("---"),
            F.lit(""),
        )
    else:
        # one part per page: f"# Page {page_num}\n{page_text}".strip() (cli.py:202)
        parts = F.array(
            _pystrip(
                F.concat(F.lit("# Page "), F.col("page_num").cast("string"), F.lit("\n"), page_text)
            )
        )

    per_page = corpus.select("book_id", "page_num", parts.alias("parts"))
    assembled = per_page.groupBy("book_id").agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("page_num", "parts"))),
                lambda x: x["parts"],
            )
        ).alias("body_parts")
    )
    if fmt == "md":
        # title parts: [f"# {title or book_id}".strip(), ""] (cli.py:174)
        head = F.array(
            _pystrip(F.concat(F.lit("# "), F.coalesce(F.lit(title), F.col("book_id")))),
            F.lit(""),
        )
        all_parts = F.concat(head, F.col("body_parts"))
    else:
        all_parts = F.col("body_parts")
    content = F.concat(_pystrip(F.array_join(all_parts, "\n\n")), F.lit("\n"))
    return assembled.select("book_id", content.alias("content"))
