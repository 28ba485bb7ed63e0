#!/usr/bin/env bash
# Three-point (sf0.1 / sf1 / sf3 = 1x / 10x / 30x) scaling evidence for
# the linear-tail families (VERDICT r16 #6): q_dedup_embed and
# q_lm_score are claimed linear scan-bound — this measures the
# dedup/text tail (plus family anchors) at a second decade point to
# show the exponent holds past 10x. Fixtures: /tmp/sf1 (all tables,
# tools/gen_sf1.scala), /tmp/sf3 (documents+embeddings only,
# tools/gen_sf3.scala). Run SOLO on an idle box.
set -euo pipefail
cd "$(dirname "$0")/.."

ONLY="q_dedup_embed,q_dedup_minhash,q_dedup_exact,q_dedup_simhash,q_lm_score,q_lang_id,q_token_count,q_quality,q_char_entropy,q_keywords"

if [ ! -d /tmp/sf1/documents.parquet ]; then
  echo "[bench_sf3] generating /tmp/sf1 fixture..."
  /opt/spark/bin/spark-shell --master 'local[32]' \
    --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
    -I tools/gen_sf1.scala <<< 'sys.exit(0)' | grep SF1ROWS
fi
if [ ! -d /tmp/sf3/documents.parquet ]; then
  echo "[bench_sf3] generating /tmp/sf3 fixture (documents+embeddings)..."
  /opt/spark/bin/spark-shell --master 'local[32]' \
    --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
    -I tools/gen_sf3.scala <<< 'sys.exit(0)' | grep SF3ROWS
fi

sbt -batch compile >/dev/null

run_sweep() { # $1 = sf dir, $2 = output path
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_REPS=2 \
    SPARK_GRAFT_BENCH_ONLY="$ONLY" \
    sbt -batch "runMain graft.Bench" >/dev/null
  mv bench_subset.json "$2"
  rm -f bench_subset.jsonl
}
echo "[bench_sf3] tail families at sf0.1..."
run_sweep /root/testdata/sf0.1 /tmp/bench_sf3_01.json
echo "[bench_sf3] tail families at sf1..."
run_sweep /tmp/sf1 /tmp/bench_sf3_1.json
echo "[bench_sf3] tail families at sf3..."
run_sweep /tmp/sf3 /tmp/bench_sf3_3.json

python3 - <<'EOF'
import json
a = json.load(open('/tmp/bench_sf3_01.json'))["queries"]
b = json.load(open('/tmp/bench_sf3_1.json'))["queries"]
c = json.load(open('/tmp/bench_sf3_3.json'))["queries"]
out = {"reps": "min-of-2", "cpus": 32,
       "scales": {"sf0.1": 1, "sf1": 10, "sf3": 30},
       "queries": {q: {"sf0.1": round(a[q], 2), "sf1": round(b[q], 2),
                       "sf3": round(c[q], 2),
                       "ratio_10x": round(b[q] / a[q], 2) if a[q] > 0 else None,
                       "ratio_30x_over_10x": round(c[q] / b[q], 2)
                           if b[q] > 0 else None}
                   for q in sorted(set(a) & set(b) & set(c))}}
json.dump(out, open('bench_sf3.json', 'w'), indent=1)
print(json.dumps(out["queries"], indent=1))
EOF
echo "[bench_sf3] wrote bench_sf3.json"
