#!/usr/bin/env bash
# Reproducible sf0.1 -> sf1 (10x) scaling evidence for SCALE.md.
#
# 1. Regenerates the /tmp/sf1 fixture if absent (tools/gen_sf1.scala —
#    /tmp is wiped between sessions; ~10x sf0.1, NOT committed). Since
#    r16 (VERDICT r15 #6) the fixture carries ALL NINE tables:
#    documents/embeddings by token-disjoint replication, the relational
#    tables by key-shifted replication (10 disjoint TPC-H universes,
#    referential integrity preserved, region/nation fixed as at any SF),
#    events by id-shifted replication with timestamps kept (10x rows per
#    window — the real 10x shape for the window/session/stream families).
# 2. Runs the FULL GATE at sf0.1 and sf1 through graft.Bench
#    (SPARK_GRAFT_BENCH_EXCLUDE="" -> a subset-mode run of every query:
#    evidence goes to bench_subset.json, the committed full-gate
#    bench_last.* files are never touched) with min-of-2 reps.
# 3. Runs the incremental-audit probe (tools/fsck_incr_probe.scala):
#    fixed delta appended to the 1x and 10x stores — incremental audit
#    wall must track the delta, full audit the store.
# 4. Assembles bench_sf1.json (committed per round): per-query seconds
#    at both scales and the 10x ratios.
#
# Run SOLO on an idle box (same discipline as the committed bench).
set -euo pipefail
cd "$(dirname "$0")/.."

if [ ! -d /tmp/sf1/lineitem.parquet ] || [ ! -d /tmp/sf1/events.parquet ] \
   || [ ! -d /tmp/sf1/documents.parquet ]; then
  echo "[bench_sf1] generating /tmp/sf1 fixture (all tables)..."
  /opt/spark/bin/spark-shell --master 'local[32]' \
    --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
    -I tools/gen_sf1.scala <<< 'sys.exit(0)' | grep SF1ROWS
fi

sbt -batch compile >/dev/null

run_sweep() { # $1 = sf dir, $2 = output path
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_REPS=2 \
    SPARK_GRAFT_BENCH_EXCLUDE="" \
    sbt -batch "runMain graft.Bench" >/dev/null
  mv bench_subset.json "$2"
  rm -f bench_subset.jsonl
}
echo "[bench_sf1] full gate at sf0.1..."
run_sweep /root/testdata/sf0.1 /tmp/bench_sf01_subset.json
echo "[bench_sf1] full gate at sf1..."
run_sweep /tmp/sf1 /tmp/bench_sf1_subset.json

echo "[bench_sf1] incremental-audit probe..."
/opt/spark/bin/spark-shell --master 'local[32]' \
  --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
  --driver-class-path target/scala-2.13/classes \
  -I tools/fsck_incr_probe.scala <<< 'sys.exit(0)' \
  | grep -o 'PROBE tag=[^ ]* store_docs=[0-9]* delta_docs=[0-9]* incr=[0-9.]*s full=[0-9.]*s\( post_compact_incr=[0-9.]*s\)\?' \
  > /tmp/fsck_probe.txt   # -o: progress-bar \r can glue onto the line start
cat /tmp/fsck_probe.txt

python3 - <<'EOF'
import json, re
a = json.load(open('/tmp/bench_sf01_subset.json'))
b = json.load(open('/tmp/bench_sf1_subset.json'))
probes = {}
for line in open('/tmp/fsck_probe.txt'):
    m = re.match(r'PROBE tag=(\S+) store_docs=(\d+) delta_docs=(\d+) '
                 r'incr=([\d.]+)s full=([\d.]+)s'
                 r'(?: post_compact_incr=([\d.]+)s)?', line.strip())
    if m:
        probes[m.group(1)] = {"store_docs": int(m.group(2)),
                              "delta_docs": int(m.group(3)),
                              "incr_secs": float(m.group(4)),
                              "full_secs": float(m.group(5))}
        if m.group(6):  # the index probe re-times after rangeBy compaction
            probes[m.group(1)]["post_compact_incr_secs"] = float(m.group(6))
common = sorted(set(a["queries"]) & set(b["queries"]))
out = {"reps": "min-of-2", "cpus": 32,
       "subset": common,
       "excluded": "none — since r16 the sf1 fixture carries all nine "
                   "tables (tools/gen_sf1.scala key-shifted replication), "
                   "so the full gate runs at both scales. Caveat for "
                   "readers: sub-second entries' ratios are dominated by "
                   "fixed JVM/job-submission overhead — read family "
                   "sums, not individual micro-query ratios",
       "sf0.1": {k: round(v, 2) for k, v in a["queries"].items()},
       "sf1": {k: round(v, 2) for k, v in b["queries"].items()},
       "ratio_10x": {k: round(b["queries"][k] / a["queries"][k], 2)
                     for k in common if a["queries"][k] > 0},
       "fsck_incr_probe": probes}
json.dump(out, open('bench_sf1.json', 'w'), indent=1)
print(json.dumps({"ratio_10x": out["ratio_10x"],
                  "fsck_incr_probe": probes}, indent=1))
EOF
# the family sums the caveat above tells readers to use (VERDICT r16 #5)
python3 tools/family_sums.py bench_sf1.json
echo "[bench_sf1] wrote bench_sf1.json"
