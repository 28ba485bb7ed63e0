#!/usr/bin/env bash
# Three-point (sf0.1 / sfr10 / sfr30 = 1x / 10x / 30x) scaling evidence for
# the linear-tail families (VERDICT r16 #6): q_dedup_embed and
# q_lm_score are claimed linear scan-bound — this measures the
# dedup/text tail (plus family anchors) at a second decade point to
# show the exponent holds past 10x. Fixtures: /tmp/sfr10 + /tmp/sfr30
# (documents+embeddings, tools/gen_sf3.scala — replica-ROTATED
# embeddings: the sf1 fixture's identical-payload replicas make
# embedding near-dup candidate pairs grow quadratically in replicas,
# which is a fixture artifact, not engine scaling). Run SOLO.
set -euo pipefail
cd "$(dirname "$0")/.."

# r18 (VERDICT r17 #3): + the quantized ANN lifecycle (build+probe,
# merge, recluster) and one streaming-runtime entry (documents-only
# q_stream_dedup_runtime) so the newest surfaces carry a second-decade
# scale point too. All run off documents/embeddings, the only tables
# the sfr fixtures carry.
# r19 (VERDICT r18 #7): + the index-store family's largest entries
# (doc-bucketed serving, bucketed shard merge, the compaction
# lifecycle) — all build their stores from `documents` only.
ONLY="q_dedup_embed,q_dedup_minhash,q_dedup_exact,q_dedup_simhash,q_lm_score,q_lang_id,q_token_count,q_quality,q_char_entropy,q_keywords,q_ann_ivf_quant,q_ann_ivf_quant_merge,q_ann_ivf_quant_recluster,q_stream_dedup_runtime,q_bm25_store_bucketed,q_store_merge_bucketed,q_store_compact"

if [ ! -d /tmp/sfr10/documents.parquet ] || [ ! -d /tmp/sfr30/documents.parquet ]; then
  echo "[bench_sf3] generating /tmp/sfr10 + /tmp/sfr30 fixtures (documents+embeddings)..."
  /opt/spark/bin/spark-shell --master 'local[32]' \
    --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
    -I tools/gen_sf3.scala <<< 'sys.exit(0)' | grep SFROWS
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
echo "[bench_sf3] tail families at 10x (rotated replicas)..."
run_sweep /tmp/sfr10 /tmp/bench_sf3_1.json
echo "[bench_sf3] tail families at 30x (rotated replicas)..."
run_sweep /tmp/sfr30 /tmp/bench_sf3_3.json

python3 - <<'EOF'
import json
A = json.load(open('/tmp/bench_sf3_01.json'))
B = json.load(open('/tmp/bench_sf3_1.json'))
C = json.load(open('/tmp/bench_sf3_3.json'))
a, b, c = A["queries"], B["queries"], C["queries"]
out = {"reps": "min-of-2", "cpus": 32,
       "scales": {"sf0.1": 1, "sfr10": 10, "sfr30": 30},
       # derived LSH geometry per scale point (VERDICT r17 #6): the
       # occupancy-rule stairstep must read as designed behavior from
       # the artifact alone
       "geometry": {sf: art.get("geometry", {}).get("q_dedup_embed")
                    for sf, art in
                    (("sf0.1", A), ("sfr10", B), ("sfr30", C))},
       "queries": {q: {"sf0.1": round(a[q], 2), "sfr10": round(b[q], 2),
                       "sfr30": round(c[q], 2),
                       "ratio_10x": round(b[q] / a[q], 2) if a[q] > 0 else None,
                       "ratio_30x_over_10x": round(c[q] / b[q], 2)
                           if b[q] > 0 else None}
                   for q in sorted(set(a) & set(b) & set(c))}}
json.dump(out, open('bench_sf3.json', 'w'), indent=1)
print(json.dumps({k: v for k, v in out.items() if k != "queries"}, indent=1))
print(json.dumps(out["queries"], indent=1))
EOF
echo "[bench_sf3] wrote bench_sf3.json"
