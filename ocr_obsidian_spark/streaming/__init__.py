"""Structured Streaming surface.

The reference is strictly batch (SURVEY.md §2.9) — streaming here extends
the engine for continuous Common-Crawl-style ingest: the same extraction
UDFs run unchanged over an unbounded pages stream (mapInPandas is
stateless), with Structured Streaming checkpoints providing the
resume-from-failure story and watermarks bounding late-data state.
"""
