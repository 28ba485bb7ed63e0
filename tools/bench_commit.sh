#!/bin/bash
# Committed-bench discipline (VERDICT r11 #1): full solo sweep, then
# automatic outlier re-verification against the previous round's
# committed evidence. Any entry >1.5x its predecessor (or a new >=5 s
# entry with no predecessor) is re-measured in a FRESH solo JVM and the
# committed value becomes the min of the two measurements, stamped
# "reverified" in both bench_last.jsonl and bench_last.json.
#
# Run on an IDLE box (no sbt test / verify in parallel — see memory:
# the first sweep after a full Verify pass measured ~20% high across
# the IO families). Usage:
#   tools/bench_commit.sh [prev.jsonl]    # default: HEAD's bench_last.jsonl
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"

PREV="${1:-}"
if [ -z "$PREV" ]; then
  PREV=$(mktemp /tmp/bench_prev.XXXX.jsonl)
  git show HEAD:bench_last.jsonl > "$PREV"
fi

echo "[bench_commit] full solo sweep at $SF"
SPARK_GRAFT_SF_DIR="$SF" sbt -batch "runMain graft.Bench" 2>&1 \
  | grep -o '{"metric".*' | tail -1 > /dev/null

PLAN_OUT=$(sbt -batch "runMain graft.BenchReverify plan $PREV bench_last.jsonl" 2>&1)
CAL=$(echo "$PLAN_OUT" | grep -o 'CAL_RATIO=.*' | tail -1 | cut -d= -f2-)
PLAN=$(echo "$PLAN_OUT" | grep -o 'REVERIFY=.*' | tail -1 | cut -d= -f2-)
echo "[bench_commit] era calibration ratio vs previous evidence: ${CAL:-n/a}" \
  "(>1 = this window's box is uniformly slower; the outlier factor is" \
  "applied era-relative)"
if [ -z "$PLAN" ]; then
  echo "[bench_commit] no era-relative outliers vs previous round — sweep is committable as-is"
  exit 0
fi

echo "[bench_commit] re-verifying outliers in a fresh solo JVM: $PLAN"
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_BENCH_ONLY="$PLAN" \
  sbt -batch "runMain graft.Bench" 2>&1 | grep -o '{"metric".*' | tail -1 > /dev/null

sbt -batch "runMain graft.BenchReverify merge bench_last.jsonl bench_subset.jsonl bench_last.jsonl bench_last.json $SF $PLAN" 2>&1 \
  | grep -o 'MERGED=.*' | tail -1
echo "[bench_commit] done — committed values are re-measured minima (stamped)"
