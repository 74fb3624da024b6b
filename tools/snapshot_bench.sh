#!/bin/bash
# Round-close bench snapshot with a non-empty guard (VERDICT r12 item 5 /
# ADVICE r12: the r12 round-close commit truncated tools/bench_r12_close
# .json to zero bytes when the clock expired mid-write, leaving invalid
# JSON in tools/). This writes to a temp file first and only moves a
# non-empty, json-parseable result into place — an expired clock or a
# killed Bench leaves the previous artifact (or nothing) instead of a
# zero-byte file.
#
# Usage: tools/snapshot_bench.sh <sfDir> <outJson> [cpus]
set -u
SF=$1; OUT=$2; CPUS=${3:-8}
TMP=$(mktemp "${OUT}.XXXX.tmp")
trap 'rm -f "$TMP"' EXIT
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$CPUS" \
  sbt -batch "runMain graft.Bench" 2>&1 | grep -F '{"metric"' > "$TMP"
if [ ! -s "$TMP" ]; then
  echo "snapshot_bench: Bench produced no metric line — NOT writing $OUT" >&2
  exit 1
fi
python3 -c "import json,sys; json.load(open(sys.argv[1]))" "$TMP" || {
  echo "snapshot_bench: metric line is not valid JSON — NOT writing $OUT" >&2
  exit 1
}
mv "$TMP" "$OUT"
trap - EXIT
echo "snapshot_bench: wrote $OUT ($(wc -c < "$OUT") bytes)"
