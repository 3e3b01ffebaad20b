"""Root-cause probe for the round-3 `jaccard_pairs` first-execution slow
mode (18.8 s first run vs 3.0-5.4 s after, same JVM, same plan).

Findings (this VM, local[32], sf0.1 — see BENCH/BASELINE.md):

  * cold JVM:                 run0 14.0 s, run1 3.0 s, run2 2.5 s
  * + python-worker warmup:   run0  8.9 s  (spin-up of 32 workers +
    numpy/pandas imports + Arrow path ≈ 5 s of the cold cost; a trivial
    64-partition pandas UDF pass costs 3-4 s and pays it)
  * + SAME PLAN run once on the 50-doc sf0.001 input (9.2 s on 50 docs —
    the cost is data-INDEPENDENT): run0 2.9 s ≈ the 2.57 s floor.

So the slow mode is per-plan-shape one-time compilation — whole-stage
codegen (janino) + C2 JIT of this query's generated stages — plus python
worker spin-up when fully cold. Not GC, not the plan, not data. bench.py
therefore runs an untimed tiny-scale pass of every headliner before
timing (steady-state definition, round 4).

Usage: python scripts/jaccard_warmup_probe.py [cold|pywarm|precompiled]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from pyspark.sql import functions as F, types as T  # noqa: E402

from ocr_obsidian_spark.session import build_session  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TINY = os.environ.get("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
MODE = sys.argv[1] if len(sys.argv) > 1 else "precompiled"


def main() -> None:
    spark = build_session("jaccard-warmup-probe", "local[32]", shuffle_partitions=32)

    def force(df):
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("h"),
        ).collect()[0]["n"]

    if MODE in ("pywarm", "precompiled"):

        @F.pandas_udf(T.LongType())
        def trivial(s: pd.Series) -> pd.Series:
            import numpy as np

            return pd.Series(np.asarray(s) * 2)

        t0 = time.monotonic()
        spark.range(0, 64_000, 1, 64).select(trivial(F.col("id"))).agg(
            F.count(F.lit(1))
        ).collect()
        print(f"python-worker warmup: {time.monotonic() - t0:.2f}s")

    if MODE == "precompiled":
        t0 = time.monotonic()
        force(entrymod.q_jaccard_pairs(spark, TINY))
        print(f"same plan on tiny input ({TINY}): {time.monotonic() - t0:.2f}s")

    for i in range(3):
        t0 = time.monotonic()
        n = force(entrymod.q_jaccard_pairs(spark, SF))
        print(f"{MODE} run {i}: wall={time.monotonic() - t0:.2f}s rows={n}")
    spark.stop()


if __name__ == "__main__":
    main()
