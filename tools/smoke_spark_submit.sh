#!/usr/bin/env bash
# End-to-end "does the shipped jar actually run" smoke: drive the capstone
# curation pipeline (curate -> FFD-pack -> WebDataset shards) through a
# REAL spark-submit invocation — not the in-process Cli.run the test suite
# uses — then assert the shards are readable by both the engine's own
# webdataset reader (the curate command's written-output count does that
# read-back) and plain GNU tar (cross-tool format check).
#
# Usage: tools/smoke_spark_submit.sh [sfDir]   (default /root/testdata/sf0.001)
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.001}"
SPARK_HOME="${SPARK_HOME:-/opt/spark}"
OUT="$(mktemp -d /tmp/graft_smoke.XXXXXX)/shards"
JAR="target/scala-2.13/trajectspark_2.13-0.1.0.jar"

[ -f "$JAR" ] || sbt -batch package

echo "[smoke] spark-submit curate -> $OUT"
LOG=$(mktemp /tmp/graft_smoke_log.XXXXXX)
if ! "$SPARK_HOME/bin/spark-submit" \
  --master "local[8]" \
  --driver-memory 8g \
  --class graft.Cli \
  "$JAR" \
  curate -o "$OUT" -w webdataset \
  -s curate.shards=8 \
  "$SF_DIR/documents.parquet" >"$LOG" 2>&1; then
  echo "[smoke] FAIL: spark-submit exited nonzero; log tail:"
  tail -20 "$LOG"
  exit 1
fi
grep -E "\[graft\]" "$LOG" || true

# the curate command logs its written-row count by reading the shards
# BACK through the engine's webdataset reader; rows therefore exist iff
# shards parse. Independently re-check the format with system tar.
SHARDS=$(ls "$OUT"/shard-*.tar 2>/dev/null | wc -l)
[ "$SHARDS" -ge 1 ] || { echo "[smoke] FAIL: no shards written"; exit 1; }
ENTRIES=$(tar -tf "$(ls "$OUT"/shard-*.tar | head -1)" | wc -l)
[ "$ENTRIES" -ge 1 ] || { echo "[smoke] FAIL: first shard has no entries"; exit 1; }
echo "[smoke] PASS: $SHARDS shards, first shard lists $ENTRIES tar entries"
