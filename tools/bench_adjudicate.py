#!/usr/bin/env python3
"""Adjudicate a driver bench artifact against the committed solo sweep.

VERDICT r15 #7: the shared-box driver window periodically inflates
individual queries 3-24x while its own calibration probes show a box no
slower than the committed run — the signature of bursty external load,
not gate code. Three rounds of judges re-derived that verdict by hand
from the _t1/_t2 mid-sweep calibration marks; this tool makes the
adjudication a committed artifact instead.

Method: the committed bench_last.jsonl is timeline-ordered (gate rows
with cal-mark rows interleaved at the sweep's thirds). We partition the
committed sweep's queries into thirds by those marks, then for each
third compare
  - the box state: median driver/committed ratio over the third's
    TRAILING calibration probes (cal_*_t1 after third 1, cal_*_t2 after
    third 2, the plain post-sweep cal_* rows after third 3), and
  - the gate work: sum of driver secs over the third's queries vs the
    committed sum.
A third whose query-time ratio far exceeds its calibration ratio ran
slow for reasons the box's own throughput cannot explain: inflated.

Verdicts per third (n = query ratio / cal ratio):
  clean     n <= 1.15
  drift     1.15 < n <= 1.30   (watch, not actionable)
  inflated  n > 1.30

Usage:
  python3 tools/bench_adjudicate.py <driver_bench.json> <committed.jsonl> \
      [-o bench_adjudication.json]
The committed jsonl can come from git: `git show <sha>:bench_last.jsonl`
piped to a temp file.
"""
import argparse
import json
import statistics
import sys


def parse_jsonl(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def thirds_from_timeline(rows):
    """Partition committed gate queries into thirds by the cal marks."""
    thirds = [[], [], []]
    cals = {}  # name -> secs (all cal rows, suffixed names preserved)
    cur = 0
    for r in rows:
        name = r["name"]
        if r.get("cal"):
            cals[name] = r["secs"]
            if name.endswith("_t1"):
                cur = max(cur, 1)
            elif name.endswith("_t2"):
                cur = max(cur, 2)
        else:
            thirds[cur].append(r)
    return thirds, cals


def median_ratio(driver_cal, committed_cal, suffix):
    ratios = []
    for probe in ("cal_cpu", "cal_shuffle", "cal_io"):
        name = probe + suffix
        d, c = driver_cal.get(name), committed_cal.get(name)
        if d and c:
            ratios.append(d / c)
    return statistics.median(ratios) if ratios else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("driver_json")
    ap.add_argument("committed_jsonl")
    ap.add_argument("-o", "--out", default="bench_adjudication.json")
    ap.add_argument("--outlier-factor", type=float, default=3.0)
    ap.add_argument("--outlier-floor-secs", type=float, default=1.0)
    args = ap.parse_args()

    with open(args.driver_json) as f:
        driver = json.load(f)
    dq = driver.get("queries", {})
    dok = driver.get("ok", {})
    dcal = driver.get("calibration", {})

    rows = parse_jsonl(args.committed_jsonl)
    thirds, ccal = thirds_from_timeline(rows)
    suffixes = ["_t1", "_t2", ""]  # trailing probe of each third

    out_thirds = []
    for i, third in enumerate(thirds):
        common = [r for r in third
                  if r.get("ok") and r["name"] in dq and dok.get(r["name"], True)]
        csum = sum(r["secs"] for r in common)
        dsum = sum(dq[r["name"]] for r in common)
        qratio = (dsum / csum) if csum > 0 else None
        cratio = median_ratio(dcal, ccal, suffixes[i])
        # WITHOUT a calibration baseline the raw ratio cannot separate an
        # honest slower box from bursty contamination — never apply the
        # inflation thresholds to it (a uniformly-slow-but-honest box
        # would read "inflated", the exact misattribution this tool
        # exists to prevent)
        norm = (qratio / cratio) if (qratio and cratio) else None
        if norm is None:
            verdict = "no-data" if qratio is None else "no-cal"
        elif norm <= 1.15:
            verdict = "clean"
        elif norm <= 1.30:
            verdict = "drift"
        else:
            verdict = "inflated"
        out_thirds.append({
            "third": i + 1,
            "queries": len(common),
            "committed_sum_secs": round(csum, 3),
            "driver_sum_secs": round(dsum, 3),
            "query_time_ratio": round(qratio, 3) if qratio else None,
            "cal_ratio": round(cratio, 3) if cratio else None,
            "normalized_ratio": round(norm, 3) if norm else None,
            "verdict": verdict,
        })

    committed_by = {r["name"]: r["secs"] for t in thirds for r in t
                    if r.get("ok")}
    outliers = sorted(
        ({"name": n,
          "committed_secs": round(committed_by[n], 3),
          "driver_secs": round(s, 3),
          "ratio": round(s / committed_by[n], 2)}
         for n, s in dq.items()
         if n in committed_by and committed_by[n] > 0
         and s >= args.outlier_floor_secs
         and s / committed_by[n] > args.outlier_factor),
        key=lambda o: -o["ratio"])

    verdicts = [t["verdict"] for t in out_thirds]
    # "clean" is a positive claim: at least one third must actually have
    # been adjudicated — a wrong artifact (no shared queries, no cal
    # rows) must not read as a successful clean adjudication
    overall = ("inflated" if "inflated" in verdicts
               else "drift" if "drift" in verdicts
               else "clean" if "clean" in verdicts
               else "no-data")
    report = {
        "driver_artifact": args.driver_json,
        "committed_artifact": args.committed_jsonl,
        "overall": overall,
        "thirds": out_thirds,
        "per_query_outliers": outliers,
        "note": ("verdicts normalize each third's query-time ratio by its "
                 "trailing calibration-probe ratio: 'inflated' means the "
                 "driver window ran gate work slow for reasons its own box "
                 "throughput cannot explain (bursty shared-box load, the "
                 "BASELINE.md contamination mode) — the committed solo "
                 "sweep is the round's performance evidence"),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(f"{overall}: " + ", ".join(
        f"third{t['third']} q={t['query_time_ratio']} cal={t['cal_ratio']} "
        f"-> {t['verdict']}" for t in out_thirds))
    print(f"{len(outliers)} per-query outliers "
          f"(>{args.outlier_factor}x, >={args.outlier_floor_secs}s); "
          f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
