#!/usr/bin/env python
"""N → 4N scaling evidence for the COMPOSED corpus recipe
(operators/recipe.py prepare_web_corpus): the ledger rows for extract
(map-dominant), minhash_pairs (shuffle) and page_rank (iterative graph)
each cover one plan family; this probe runs the full published pipeline
— url dedup → lang → Gopher → C4 → line/exact/near dedup → PII — whose
job mixes all of them, at local[2] vs local[8] on identical input.

Protocol mirrors scripts/shuffle_scaling_probe.py: fresh JVM per sample,
levels INTERLEAVED across rounds, best-of fold per level, every sample
appended to BENCH/SCALING_RECIPE.json before the next starts, untimed
sf0.001 warmup pass (per-plan-shape codegen/JIT is data-independent).

Input: the sf0.1 documents table replicated REPLICATE× with distinct ids
AND a per-line replica token prefixed to the text — replicas must NOT be
exact or near duplicates of each other (a verbatim copy would make the
dedup stages collapse the whole replication and the near-dup component
graph quadratic in REPLICATE); the per-line token shifts ~1/4 of each
line's word shingles, putting cross-replica Jaccard ~0.69 < the 0.8
threshold while keeping the text statistics Gopher/C4-realistic.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = os.environ.get("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
REPLICATE = int(os.environ.get("SPARK_GRAFT_REPLICATE", "8"))
ROUNDS = int(os.environ.get("SPARK_GRAFT_SCALING_ROUNDS", "3"))
LEVELS = [int(x) for x in os.environ.get("SPARK_GRAFT_LEVELS", "2,8").split(",")]
LEDGER = REPO / "BENCH" / "SCALING_RECIPE.json"


def sample(cpus: int) -> dict:
    sys.path.insert(0, str(REPO))
    from pyspark.sql import functions as F

    from ocr_obsidian_spark.operators.recipe import prepare_web_corpus
    from ocr_obsidian_spark.session import build_session

    spark = build_session(
        "recipe-scaling", f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )

    def force(df):
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("h"),
        ).collect()[0]["n"]

    from __spark_entry__ import crawl_shape

    def load(sf_dir, replicate):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        # crawl-shape FIRST, via the SHARED rule (the sf text is
        # single-line unpunctuated word salad, which the C4 gate
        # vacuously empties — an unshaped probe times a hollow
        # pipeline, docs_out = 0), THEN perturb per replica
        docs = docs.withColumn("text", crawl_shape(F.col("text")))
        copies = []
        for k in range(replicate):
            tok = f"r{k}"
            text = F.concat(
                F.lit(tok + " "),
                F.regexp_replace(
                    F.coalesce(F.col("text"), F.lit("")), "\n", f"\n{tok} "
                ),
            )
            nid = F.col("doc_id") + 1_000_000 * k
            url = F.concat(
                F.lit("https://"), F.col("source"), F.lit("-"),
                (nid % 7).cast("string"), F.lit(".test/doc/"),
                nid.cast("string"),
            )
            copies.append(
                docs.select(
                    nid.alias("doc_id"), text.alias("text"),
                    url.alias("url"), "source",
                )
            )
        big = copies[0]
        for c in copies[1:]:
            big = big.unionByName(c)
        from pyspark import StorageLevel

        big = big.repartition(cpus * 4, "doc_id").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        return big, big.count()

    def run(df):
        res = prepare_web_corpus(df, langs=None)  # attach lang, keep all
        return force(res.df)

    if WARM_DIR and os.path.isdir(WARM_DIR):
        warm, _ = load(WARM_DIR, 1)
        run(warm)
        warm.unpersist()

    big, n_docs = load(SF_DIR, REPLICATE)
    t0 = time.monotonic()
    n_out = run(big)
    sec = round(time.monotonic() - t0, 3)
    spark.stop()
    return {
        "sec": sec, "docs": n_docs, "docs_out": n_out,
        "docs_per_sec": round(n_docs / sec, 1),
    }


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--sample":
        print(json.dumps(sample(int(sys.argv[2]))))
        return

    def append(cpus: int, d: dict) -> None:
        # key by replicate too: folding best-of across DIFFERENT input
        # scales would mix amortization levels into one ratio
        ledger = json.loads(LEDGER.read_text()) if LEDGER.exists() else {}
        ledger.setdefault(f"{cpus}@x{REPLICATE}", []).append(d)
        LEDGER.write_text(json.dumps(ledger, indent=1))

    for r in range(ROUNDS):
        for cpus in LEVELS:
            print(f"round {r + 1}/{ROUNDS} local[{cpus}] ...", file=sys.stderr)
            out = subprocess.run(
                [sys.executable, __file__, "--sample", str(cpus)],
                capture_output=True, text=True, timeout=3600,
                env=dict(os.environ),
            )
            if out.returncode != 0:
                print(f"  sample failed: {out.stderr[-800:]}", file=sys.stderr)
                continue
            d = json.loads(out.stdout.strip().splitlines()[-1])
            append(cpus, d)
            print(f"  {d}", file=sys.stderr)

    if not LEDGER.exists():
        print("no sample succeeded; see the per-sample errors above",
              file=sys.stderr)
        return
    ledger = json.loads(LEDGER.read_text())
    best = {}
    for c in LEVELS:
        rows = ledger.get(f"{c}@x{REPLICATE}", [])
        if rows:
            best[c] = max(rows, key=lambda d: d["docs_per_sec"])
    report = {"operator": "prepare_corpus", "sf": SF_DIR,
              "replicate": REPLICATE,
              "best": {str(c): best[c] for c in best}}
    for a, b in [(2, 8), (4, 16), (8, 32)]:
        if a in best and b in best:
            report[f"efficiency_{a}to{b}"] = round(
                (best[b]["docs_per_sec"] / best[a]["docs_per_sec"]) / (b / a), 3
            )
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
