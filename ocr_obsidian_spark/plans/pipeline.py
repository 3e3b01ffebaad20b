"""The full extraction pipeline, composed.

    pages ──extract_pages──► corpus' ──apply_printed_page_mode──► corpus
                                 │
    triggers ────make_spans──────┤
                                 ▼
                            emit_notes ──► notes

Stage boundaries mirror the reference's five CLI stages (SURVEY.md §0) but
collapse the page-local work into single map stages; the whole pipeline has
exactly one required shuffle (the per-book mode window) plus the spans/emit
equi-joins.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..operators.emit import BookMeta, emit_notes
from ..operators.extract import extract_pages
from ..operators.lineage import partition_metrics
from ..operators.printed_page import apply_printed_page_mode
from ..operators.spans_op import make_spans


@dataclass
class PipelineResult:
    corpus: DataFrame
    spans: DataFrame | None
    notes: DataFrame | None


def run_pipeline(
    pages: DataFrame,
    triggers: DataFrame | None = None,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    *,
    run_id: str = "run-0",
    book_meta: BookMeta | None = None,
    broadcast_triggers: bool = True,
    persist_corpus: bool = True,
) -> PipelineResult:
    raw = extract_pages(pages, cfg)
    if persist_corpus:
        # stage boundary: the mode window + every downstream consumer read
        # the one-pass extract output instead of re-running the UDF
        # (the reference's single-OCR-pass rule, README.md:3-8; at cluster
        # scale this boundary is the checkpointed corpus table itself)
        from pyspark import StorageLevel

        raw = raw.persist(StorageLevel.MEMORY_AND_DISK)
    corpus = apply_printed_page_mode(raw, cfg)
    spans = notes = None
    if triggers is not None:
        spans = make_spans(corpus, triggers, cfg, broadcast_triggers=broadcast_triggers)
        notes = emit_notes(corpus, spans, cfg, run_id=run_id, book_meta=book_meta)
    return PipelineResult(corpus=corpus, spans=spans, notes=notes)


def corpus_lineage(corpus: DataFrame, *, run_id: str, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    return partition_metrics(
        corpus, run_id=run_id, stage="extract", config_hash=cfg.config_hash()
    )
