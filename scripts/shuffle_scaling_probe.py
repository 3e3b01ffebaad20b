#!/usr/bin/env python
"""N → 4N scaling evidence for a SHUFFLE-BEARING operator (round-4
verdict item #6): the north-rule ledger (BENCH/SCALING.json) covers the
map-dominant extract pipeline; this probe measures minhash_pairs — the
suite's canonical shuffle shape (map-only signatures → band explode →
bucket join → distinct) — at local[2] vs local[8] on identical input.

Protocol mirrors scripts/scaling_bench.py: fresh JVM per sample
(subprocess), levels INTERLEAVED across rounds, best-of fold per level
(host interference only ever adds time), every sample appended to the
ledger (BENCH/SCALING_SHUFFLE.json) before the next starts. Both levels
sit inside the uncontended half of the VM's 32 cores.

Input: the sf0.1 documents table replicated REPLICATE× (default 4 →
20k docs) with distinct ids, persisted and counted BEFORE the timer;
an untimed sf0.001 pass first (per-plan-shape codegen/JIT compile is
data-independent — the round-4 measured warmup rule).
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
REPLICATE = int(os.environ.get("SPARK_GRAFT_REPLICATE", "4"))
ROUNDS = int(os.environ.get("SPARK_GRAFT_SCALING_ROUNDS", "3"))
LEVELS = [int(x) for x in os.environ.get("SPARK_GRAFT_LEVELS", "2,8").split(",")]
LEDGER = REPO / "BENCH" / "SCALING_SHUFFLE.json"


def sample(cpus: int) -> dict:
    """One fresh-JVM sample: returns {sec, docs, docs_per_sec}."""
    sys.path.insert(0, str(REPO))
    from pyspark.sql import functions as F

    from ocr_obsidian_spark.operators.dedup import minhash_lsh_candidate_pairs
    from ocr_obsidian_spark.session import build_session

    spark = build_session(
        "shuffle-scaling", f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )

    def force(df):
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("h"),
        ).collect()[0]["n"]

    def load(sf_dir, replicate):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        copies = [
            docs.select(
                (F.col("doc_id") + 1_000_000 * k).alias("doc_id"),
                "text", "lang", "source", "n_chars",
            )
            for k in range(replicate)
        ]
        big = copies[0]
        for c in copies[1:]:
            big = big.unionByName(c)
        from pyspark import StorageLevel

        big = big.repartition(cpus, "doc_id").persist(StorageLevel.MEMORY_AND_DISK)
        return big, big.count()

    if WARM_DIR and os.path.isdir(WARM_DIR):
        warm, _ = load(WARM_DIR, 1)
        force(minhash_lsh_candidate_pairs(warm))
        warm.unpersist()

    big, n_docs = load(SF_DIR, REPLICATE)
    t0 = time.monotonic()
    force(minhash_lsh_candidate_pairs(big))
    sec = round(time.monotonic() - t0, 3)
    spark.stop()
    return {"sec": sec, "docs": n_docs, "docs_per_sec": round(n_docs / sec, 1)}


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--sample":
        print(json.dumps(sample(int(sys.argv[2]))))
        return

    def append(cpus: int, d: dict) -> None:
        ledger = json.loads(LEDGER.read_text()) if LEDGER.exists() else {}
        ledger.setdefault(str(cpus), []).append(d)
        LEDGER.write_text(json.dumps(ledger, indent=1))

    for r in range(ROUNDS):
        for cpus in LEVELS:
            print(f"round {r + 1}/{ROUNDS} local[{cpus}] ...", file=sys.stderr)
            out = subprocess.run(
                [sys.executable, __file__, "--sample", str(cpus)],
                capture_output=True, text=True, timeout=1800,
                env=dict(os.environ),
            )
            if out.returncode != 0:
                print(f"  sample failed: {out.stderr[-800:]}", file=sys.stderr)
                continue
            d = json.loads(out.stdout.strip().splitlines()[-1])
            append(cpus, d)
            print(f"  {d}", file=sys.stderr)

    ledger = json.loads(LEDGER.read_text())
    best = {}
    for c in LEVELS:
        rows = ledger.get(str(c), [])
        if rows:
            best[c] = max(rows, key=lambda d: d["docs_per_sec"])
    report = {"operator": "minhash_pairs", "sf": SF_DIR,
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
