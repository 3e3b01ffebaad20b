"""Book-text export: corpus → one concatenated text/markdown document per
book (reference ingest/cli.py:162-215, run_export_book_text).

Pure relational: pages sorted per book, per-page header + extracted text,
joined with blank lines. The per-page text/gate/placeholder decision already
lives in the corpus (``extracted_text``); display page number prefers the
detected printed page (cli.py:178-183).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def export_book_text(corpus: DataFrame, *, fmt: str = "txt", title: str | None = None) -> DataFrame:
    """(book_id, content) — ``fmt`` is 'txt' or 'md' (reference cli.py:174-201).

    txt:  '# Page {page_num}\\n{text}' blocks joined by blank lines
    md:   '# {title}' header, then '## Page {display} (scan: ...)' sections
          with '---' rules
    """
    display_page = F.coalesce(F.col("printed_page").cast("string"), F.col("page_num").cast("string"))
    if fmt == "md":
        section = F.concat(
            F.lit("## Page "), display_page,
            F.lit(" (scan: "), F.coalesce(F.col("scan_relpath"), F.lit("")), F.lit(")"),
            F.lit("\n\n"), F.trim(F.coalesce(F.col("extracted_text"), F.lit(""))),
            F.lit("\n\n---\n"),
        )
    else:
        section = F.trim(
            F.concat(
                F.lit("# Page "), F.col("page_num").cast("string"), F.lit("\n"),
                F.coalesce(F.col("extracted_text"), F.lit("")),
            )
        )

    per_page = corpus.select("book_id", "page_num", section.alias("section"))
    assembled = per_page.groupBy("book_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("page_num", "section"))),
                lambda x: x["section"],
            ),
            "\n\n",
        ).alias("body")
    )
    if fmt == "md":
        head = F.concat(F.lit("# "), F.coalesce(F.lit(title), F.col("book_id")), F.lit("\n\n"))
        content = F.concat(head, F.col("body"))
    else:
        content = F.col("body")
    return assembled.select("book_id", F.rtrim(content).alias("content"))
