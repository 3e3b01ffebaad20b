#!/usr/bin/env python
"""N -> 4N scaling evidence for the ITERATIVE graph operator
(page_rank): the ledger covers the map-dominant extract pipeline
(BENCH/SCALING.json) and the one-shot shuffle shape minhash_pairs
(BENCH/SCALING_SHUFFLE.json); this probe measures the third plan
family — per-iteration join + groupBy + join-back over lineage-
truncated state (4 power iterations) — at local[2] vs local[8] on an
identical synthetic host graph.

Protocol mirrors scripts/shuffle_scaling_probe.py: fresh JVM per
sample (subprocess), levels INTERLEAVED across rounds, best-of fold
per level (host interference only ever adds time), every sample
appended to the ledger (BENCH/SCALING_GRAPH.json) before the next
starts; untimed small pass first (per-plan-shape codegen/JIT compile
is data-independent — the round-4 measured warmup rule).

Input: a deterministic hash-derived edge list (EDGES total edges over
HOSTS hosts, zipfian-free uniform buckets), persisted and counted
BEFORE the timer. The graph is synthetic by construction — page_rank's
input IS an edge list; the corpus never enters this plan family.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
EDGES = int(os.environ.get("SPARK_GRAFT_GRAPH_EDGES", "2000000"))
HOSTS = int(os.environ.get("SPARK_GRAFT_GRAPH_HOSTS", "200000"))
ITERS = int(os.environ.get("SPARK_GRAFT_GRAPH_ITERS", "4"))
ROUNDS = int(os.environ.get("SPARK_GRAFT_SCALING_ROUNDS", "3"))
LEVELS = [int(x) for x in os.environ.get("SPARK_GRAFT_LEVELS", "2,8").split(",")]
LEDGER = REPO / "BENCH" / "SCALING_GRAPH.json"


def sample(cpus: int) -> dict:
    sys.path.insert(0, str(REPO))
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from ocr_obsidian_spark.operators.graphrank import page_rank
    from ocr_obsidian_spark.session import build_session

    spark = build_session(
        "graph-scaling", f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )

    def force(df):
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("h"),
        ).collect()[0]["n"]

    def load(n_edges: int, n_hosts: int):
        # pmod, not %: xxhash64 is signed, so a bare % would silently
        # double the host universe (h-42 and h42 as distinct nodes) and
        # halve the average degree vs the recorded HOSTS parameter
        e = (
            spark.range(n_edges)
            .select(
                F.concat(F.lit("h"), F.pmod(F.xxhash64("id"), n_hosts)).alias("src"),
                F.concat(
                    F.lit("h"), F.pmod(F.xxhash64("id", F.lit(1)), n_hosts)
                ).alias("dst"),
            )
            .repartition(cpus)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        return e, e.count()

    warm, _ = load(10_000, 1_000)
    force(page_rank(warm, iters=ITERS))
    warm.unpersist()

    edges, n_edges = load(EDGES, HOSTS)
    t0 = time.monotonic()
    force(page_rank(edges, iters=ITERS))
    sec = round(time.monotonic() - t0, 3)
    spark.stop()
    return {"sec": sec, "edges": n_edges, "edges_per_sec": round(n_edges / sec, 1)}


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
            best[c] = max(rows, key=lambda d: d["edges_per_sec"])
    report = {
        "operator": "page_rank", "edges": EDGES, "hosts": HOSTS,
        "iters": ITERS, "best": {str(c): best[c] for c in best},
    }
    for a, b in [(2, 8), (4, 16), (8, 32)]:
        if a in best and b in best:
            report[f"efficiency_{a}to{b}"] = round(
                (best[b]["edges_per_sec"] / best[a]["edges_per_sec"]) / (b / a), 3
            )
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
