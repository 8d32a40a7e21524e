#!/usr/bin/env bash
# Real-cluster submission for the flagship job (the north rule's
# `spark-submit --py-files` deployment at N and 4N executors).
#
#   tools/submit_cluster.sh <master-url> <num-executors> <input-path> <out-root> [run-id]
#
# Run it twice (e.g. 8 and 32 executors) against the same input and compare
# the reported wall times for the N-vs-4N scaling-efficiency gate; the job is
# resumable, so a rerun with the same run-id skips committed sinks.
#
# In local sandboxes use bench.py instead (this script assumes a real master).
set -euo pipefail

MASTER="${1:?master url (yarn|spark://...|k8s://...)}"
NUM_EXECUTORS="${2:?executor count}"
INPUT="${3:?input sequences table path}"
OUT_ROOT="${4:?output root}"
RUN_ID="${5:-run-$(date +%s)}"

REPO_DIR="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="$(mktemp -d)/loongcollector_spark.zip"
(cd "$REPO_DIR" && zip -qr "$ZIP" loongcollector_spark)

spark-submit \
  --master "$MASTER" \
  --num-executors "$NUM_EXECUTORS" \
  --executor-cores 4 \
  --executor-memory 8g \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.coalescePartitions.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.execution.arrow.maxRecordsPerBatch=65536 \
  --conf spark.sql.shuffle.partitions="$((NUM_EXECUTORS * 8))" \
  "$REPO_DIR/tools/run_job_cli.py" "$INPUT" "$OUT_ROOT" "$RUN_ID"
