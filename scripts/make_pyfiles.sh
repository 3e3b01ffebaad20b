#!/usr/bin/env bash
# Package the engine for cluster submission (BASELINE.json north_rule:
# "run via spark-submit --py-files on a multi-executor cluster").
#
#   ./scripts/make_pyfiles.sh          # -> dist/ocr_obsidian_spark.zip
#   spark-submit --py-files dist/ocr_obsidian_spark.zip \
#       --conf spark.sql.adaptive.enabled=true \
#       --conf spark.sql.adaptive.skewJoin.enabled=true \
#       --conf spark.sql.execution.arrow.maxRecordsPerBatch=512 \
#       --conf spark.python.worker.reuse=true \
#       scripts/run_extract_job.py --input <pages table> --out <corpus table> \
#       --run-id <id> --buckets 4096
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/ocr_obsidian_spark.zip
zip -qr dist/ocr_obsidian_spark.zip ocr_obsidian_spark -x '*/__pycache__/*'
echo "wrote dist/ocr_obsidian_spark.zip"
