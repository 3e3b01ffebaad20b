#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

    {"metric": "headline_total_sec", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": <dir>,
     "docs_per_sec": <extraction throughput>, "cpus": N}

The flagship ``extract`` query measures the north-rule metric
(documents/sec through the full byte-identical extraction pipeline); the
corpus is the sf documents table replicated ``SPARK_GRAFT_REPLICATE``×
(default 4) with distinct ids so the map stage has enough partitions to
exercise all cores. Same seed + same input ⇒ run-to-run comparable and
usable for the N-vs-4N scaling evidence (scripts/scaling_bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("SPARK_GRAFT_REPLICATE", "16"))  # 80k pages at
# sf0.1 — the BENCH/BASELINE.md comparison scale


def main() -> None:
    from ocr_obsidian_spark.session import build_session

    spark = build_session(
        "ocr-obsidian-bench",
        f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
        # flat (lines_json) corpus rows are small — bigger Arrow batches
        # amortize the per-task python-runner overhead
        arrow_max_records_per_batch=int(os.environ.get("SPARK_GRAFT_ARROW_BATCH", "512")),
    )

    import __spark_entry__ as entrymod

    def tbl(name):
        return spark.read.parquet(f"{SF_DIR}/{name}.parquet")

    timings: dict[str, float] = {}
    extract_docs = 0
    only = os.environ.get("SPARK_GRAFT_ONLY", "")
    # targeted mode ("name[,name...]", not "extract"): skip the flagship
    # extract stage entirely — used by the shuffle-operator scaling probe
    run_extract_stage = (not only) or only == "extract"

    def timed(name, fn):
        t0 = time.monotonic()
        out = fn()
        timings[name] = round(time.monotonic() - t0, 3)
        return out

    # -- flagship: full extraction pipeline (docs/sec is the north metric) --
    from ocr_obsidian_spark.operators.extract import extract_pages
    from ocr_obsidian_spark.operators.printed_page import apply_printed_page_mode
    from ocr_obsidian_spark.sources.doc_pages import pages_from_documents

    if run_extract_stage:
        docs = tbl("documents")
        if REPLICATE > 1:
            n = docs.count()
            copies = [
                docs.select(
                    (F.col("doc_id") + 1_000_000 * k).alias("doc_id"),
                    "text", "lang", "source", "n_chars",
                )
                for k in range(REPLICATE)
            ]
            big = copies[0]
            for c in copies[1:]:
                big = big.unionByName(c)
            extract_docs = n * REPLICATE
        else:
            big = docs
            extract_docs = docs.count()

        # input materialization is scaffolding, not the engine: persist the page
        # bytes before the timer so "extract" measures tokenize→render→mode only
        from pyspark import StorageLevel

        # one task per core: pages are uniform (no skew tail) and per-task
        # python-runner setup is the dominant fixed cost at high parallelism
        pages = pages_from_documents(big.repartition(CPUS, "doc_id")).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        pages.count()
        # JVM codegen + python-worker warmup (untimed): workers are reused
        # across jobs; a 10% sample keeps every partition (and thus every
        # worker) warm at a tenth of the cost of a full pass
        extract_pages(pages.sample(0.1, seed=1)).count()

        # the stage boundary is a DURABLE corpus write (the real pipeline shape:
        # extract once, write the canonical table, downstream reads it — the
        # reference's single-OCR-pass rule). Parquet write+read measured ~1.5×
        # cheaper than the in-memory columnar cache for these wide string rows,
        # and the mode window then reads a column-pruned narrow projection.
        import shutil
        import tempfile

        corpus_path = os.path.join(
            tempfile.gettempdir(), f"bench_corpus_{os.getpid()}"
        )
        shutil.rmtree(corpus_path, ignore_errors=True)

        def run_extract():
            extract_pages(pages).write.mode("overwrite").parquet(corpus_path)
            corpus = apply_printed_page_mode(spark.read.parquet(corpus_path))
            # force full materialization of the text column, not just row count
            return corpus.select(
                F.sum(F.length("extracted_text")).alias("b"), F.count(F.lit(1)).alias("n")
            ).collect()[0]["n"]

        n_extracted = timed("extract", run_extract)
        shutil.rmtree(corpus_path, ignore_errors=True)
        assert n_extracted == extract_docs

    # -- operator headliners (same definitions as the driver contract) --
    qs = entrymod.queries()
    headliners = [] if only == "extract" else [
        "agg_bounds", "join_agg", "asof_join", "context_window", "mode_switch",
        "topk_rank", "text_metrics", "token_counts", "quality_stats",
        "fingerprint", "block_candidates", "exact_dedup", "minhash_pairs",
        "simhash", "jaccard_pairs", "embedding_topk", "embedding_near_dup",
        "lsh_ann", "ivf_ann",
        # web-corpus preparation suite (round 3)
        "domain_cap", "hash_sample", "decontaminate", "pii_scrub", "unicode_nfc",
        "repetition_stats", "quality_tiers", "line_dedup",
        "html_blocks", "html_extract", "url_canon", "mix_corpus",
        "pack_shards", "url_dedup", "script_mix", "paragraph_dedup",
        "blocklist", "gopher_flags", "c4_filter",
        # round 4: IDN canonicalization + real subword tokenizer + full
        # Gopher repetition rule set
        "url_canon_idn", "subword_tokens", "gopher_rep",
        # round 5: ExactSubstr-style substring dedup, KN-bigram LM
        # perplexity, NB-cascade language ID (lang_id and subword_tokens
        # rows are NEW definitions this round — model cascade / both-mode
        # tokenization — not comparable to any earlier row)
        "substr_dedup", "lm_ppl", "lang_id", "pack_sequences",
        # round 5 (late): character-level BPE over the fixture merge
        # table, then unigram-LM Viterbi over the fixture cost table,
        # then SemDeDup semantic dedup labels over embeddings, then
        # DSIR importance-resampling weights + Gumbel top-k
        "bpe_tokens", "unigram_tokens", "semantic_dedup", "dsir",
        # round 5 (late): fastText-style supervised quality classifier,
        # then snapshot-vs-corpus incremental dedup, then integer-exact
        # host-graph PageRank (4 power iterations over the synthetic
        # host-link graph)
        "quality_clf", "incremental_dedup", "page_rank",
        # round 5 (late): multilingual alpha-sampling (one tiny groupBy
        # count to the driver + the map-only mix_corpus bucket filter),
        # then the composed one-job corpus recipe (url dedup → lang →
        # Gopher → C4 → line/exact/near dedup → decontaminate → PII)
        "alpha_sample", "prepare_corpus",
    ]
    if only and only != "extract":
        # targeted mode for scaling probes: comma-separated query names,
        # extract skipped entirely
        headliners = [q for q in only.split(",") if q]
    # Forcing function (bench definition, changed in round 4): .count()
    # lets Catalyst prune every row-preserving projection — including
    # Arrow-batched UDFs — so a map-only query (pii_scrub, url_canon,
    # subword_tokens, ...) would "measure" a bare scan+count. Hashing all
    # output columns into one aggregate forces full materialization of
    # every result value while adding only one cheap JVM hash per row.
    def force(df):
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            # bit_xor, not sum: summing 64-bit hashes overflows ANSI mode
            F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("h"),
        ).collect()[0]["n"]

    # "simhash" keeps benching the xxhash64 PRODUCTION fingerprint
    # (BASELINE.md definition); the driver contract's simhash query is its
    # md5 oracle twin — same vote logic, slower hash, oracled instead
    from ocr_obsidian_spark.operators.dedup import simhash64

    def run_one(name, sf_dir):
        if name == "simhash":
            return force(simhash64(entrymod._t(spark, sf_dir, "documents", spread=True)))
        if name == "substr_dedup":
            # bench the xxhash64 PRODUCTION anchors (8-byte shuffle keys);
            # the driver contract's query is its md5 oracle twin — same
            # semantics, DuckDB-shared hash (the simhash precedent)
            return force(entrymod.q_substr_dedup(spark, sf_dir, anchor_hash="xxhash64"))
        # bench rows keep their round-4 definitions even where the driver
        # registry folded queries into compound suites (round 5): prefer
        # the original per-shape function over the registry entry
        fn = getattr(entrymod, f"q_{name}", None) or qs[name]
        return force(fn(spark, sf_dir))

    # Steady-state definition (round 4): run every headliner once at tiny
    # scale first, UNTIMED. Whole-stage-codegen (janino) compilation + JIT
    # of a query's generated stages is a per-PLAN-SHAPE, data-independent
    # one-time cost — measured 9.2 s for jaccard_pairs on a 50-doc input,
    # after which the first sf0.1 execution lands on its floor (2.9 s vs
    # 14 s cold; scripts/jaccard_warmup_probe.py). At 100 TB that cost is
    # amortized to zero; timing it into single-shot rows misreports every
    # complex plan by its compile time, not its throughput.
    warm_dir = os.environ.get("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    if warm_dir and os.path.isdir(warm_dir):
        for name in headliners:
            try:
                run_one(name, warm_dir)
            except Exception:
                pass  # warmup is best-effort; the timed run will surface it

    for name in headliners:
        timed(name, lambda n=name: run_one(n, SF_DIR))

    total = round(sum(timings.values()), 3)
    docs_per_sec = (
        round(extract_docs / timings["extract"], 1)
        if timings.get("extract") else 0.0
    )
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR,
                "docs_per_sec": docs_per_sec,
                "extract_docs": extract_docs,
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
