#!/usr/bin/env bash
# Warm serving-latency evidence (VERDICT r12 #4): build each store once
# at sf0.1, time k warm query jobs per face, report p50/p95 — plain vs
# doc-bucketed — into bench_serving.json (committed per round). The gate
# entries time build+query lifecycles; this is the marginal per-query
# cost a serving deployment cares about, and the direct measurement of
# the doc-bucketed layout's benefit. Run SOLO on an idle box.
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"

sbt -batch compile >/dev/null

SPARK_GRAFT_SF_DIR="$SF" /opt/spark/bin/spark-shell --master 'local[32]' \
  --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
  --driver-class-path target/scala-2.13/classes \
  -I tools/serve_latency.scala <<< 'sys.exit(0)' \
  | grep -o 'SERVE[A-Z]* [a-z_=0-9. ]*' > /tmp/serve_latency.txt
  # -o: spark progress-bar \r can glue onto line starts
cat /tmp/serve_latency.txt

python3 - "$SF" <<'EOF'
import json, re, sys
builds, faces, store_bytes = {}, {}, {}
for line in open('/tmp/serve_latency.txt'):
    m = re.match(r'SERVEBUILD store=(\S+) secs=([\d.]+)', line)
    if m:
        builds[m.group(1)] = float(m.group(2))
    m = re.match(r'SERVEBYTES store=(\S+) bytes=(\d+)', line)
    if m:
        store_bytes[m.group(1)] = int(m.group(2))
    m = re.match(r'SERVE face=(\S+) layout=(\S+) reps=(\d+) '
                 r'p50=([\d.]+) p95=([\d.]+)', line)
    if m:
        faces.setdefault(m.group(1), {})[m.group(2)] = {
            "reps": int(m.group(3)),
            "p50_secs": float(m.group(4)), "p95_secs": float(m.group(5))}
# fail loudly on a partial probe (a thrown face would otherwise
# silently vanish from the artifact)
expected = {"bm25_single", "bm25_batch200", "phrase_batch200",
            "prox_batch200", "ivf_probe20"}
missing = expected - set(faces)
assert not missing, f"probe faces missing from output: {sorted(missing)}"
ratios = {f: round(v["plain"]["p50_secs"] / v["docbkt"]["p50_secs"], 2)
          for f, v in faces.items() if "plain" in v and "docbkt" in v}
# merged-store parity (VERDICT r13 #8): merged p50 over plain p50 per
# face, and the reclustered IVF probe over its plain baseline
merged = {f: round(v["merged"]["p50_secs"] / v["plain"]["p50_secs"], 2)
          for f, v in faces.items() if "merged" in v and "plain" in v}
ivf = faces.get("ivf_probe20", {})
if "reclustered" in ivf and "plain" in ivf:
    merged["ivf_probe20_reclustered"] = round(
        ivf["reclustered"]["p50_secs"] / ivf["plain"]["p50_secs"], 2)
if "quantized" in ivf and "plain" in ivf:
    merged["ivf_probe20_quantized"] = round(
        ivf["quantized"]["p50_secs"] / ivf["plain"]["p50_secs"], 2)
out = {"sf": sys.argv[1], "cpus": 32,
       "build_secs": {k: round(v, 2) for k, v in builds.items()},
       "faces": faces, "plain_over_docbkt_p50": ratios,
       "merged_over_plain_p50": merged}
if store_bytes:
    out["store_bytes"] = store_bytes
    if {"ivf_lists", "ivf_quant_lists"} <= set(store_bytes):
        out["quant_bytes_ratio"] = round(
            store_bytes["ivf_lists"] / store_bytes["ivf_quant_lists"], 2)
json.dump(out, open('bench_serving.json', 'w'), indent=1)
print(json.dumps({"plain_over_docbkt_p50": ratios,
                  "merged_over_plain_p50": merged}, indent=1))
EOF
echo "[serve_latency] wrote bench_serving.json"
