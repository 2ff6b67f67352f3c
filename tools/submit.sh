#!/usr/bin/env bash
# Submit the pipeline job the way a real cluster would receive it:
# package zipped, shipped via --py-files, master picked by $1.
#
#   tools/submit.sh [cores] [sf_dir] [out_dir] [extra pipeline args...]
#
# The scaling evidence in BENCH.md is two invocations of this script
# (cores=8 and cores=32) on the same input.
set -euo pipefail

CORES="${1:-32}"
SF_DIR="${2:-/root/testdata/sf0.1}"
OUT="${3:-/tmp/vtzero_pipeline_out_${CORES}}"
shift $(( $# > 3 ? 3 : $# )) || true

REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP=/tmp/vtzero_spark_pyfiles.zip

rm -f "$ZIP"
(cd "$REPO" && zip -qr "$ZIP" vtzero_spark -x '*__pycache__*')

mkdir -p /dev/shm/spark-local
exec /opt/spark/bin/spark-submit \
    --master "local[${CORES}]" \
    --conf spark.local.dir=/dev/shm/spark-local \
    --conf spark.sql.shuffle.partitions=$(( CORES * 2 )) \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.sql.execution.arrow.pyspark.enabled=true \
    --conf spark.driver.memory=8g \
    --conf spark.ui.enabled=false \
    --py-files "$ZIP" \
    "$REPO/tools/pipeline_job.py" --sf-dir "$SF_DIR" --out "$OUT" "$@"
