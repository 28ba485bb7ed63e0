#!/usr/bin/env python3
"""Sync the query/test/suite counts in README.md and COVERAGE.md from
ground truth, so the docs (and commit messages quoting this tool's
output) can't diverge from reality (VERDICT r15 #8: COVERAGE said 358
while a commit message said 357).

Ground truth:
  - gate queries: distinct "q_*" keys across the graft.queries group
    sources (queries and oracles maps share names; oracle keys are a
    subset, so the distinct union IS the query count);
  - tests/suites: the scalatest summary lines of a FULL `sbt test` log
    (pass --test-log; the tool refuses to guess from static grep —
    dynamic/property cases make source counts lie).

Usage:
  python3 tools/sync_counts.py --test-log /tmp/fulltest.log
Prints the counts (paste into the commit message) and rewrites the two
docs in place. Exits 1 if the log carries no scalatest summary.
"""
import argparse
import pathlib
import re
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
# The queries whose oracle checks a quality BOUND (a boolean claim)
# rather than value-for-value rows. No structural marker distinguishes
# them in source, so the list is named here and query_count() asserts
# each still exists — adding/removing a bounds oracle without updating
# this list fails the sync instead of silently stamping a stale
# value-for-value count into the docs (the review's drift scenario).
BOUNDS_ORACLE_NAMES = {"q_sketch_distinct", "q_sketch_quantile",
                       "q_profile_approx", "q_ann_ivf_refined"}


def query_count():
    out = subprocess.run(
        ["grep", "-rhoE", '"q_[a-z0-9_]+" ->',
         str(REPO / "src/main/scala/graft/queries")],
        capture_output=True, text=True, check=True).stdout
    names = {line.split('"')[1] for line in out.splitlines()}
    missing = BOUNDS_ORACLE_NAMES - names
    if missing:
        sys.exit(f"bounds-oracle list is stale (not in sources: "
                 f"{sorted(missing)}) — update BOUNDS_ORACLE_NAMES")
    return len(names)


def test_counts(log_path):
    text = pathlib.Path(log_path).read_text(errors="replace")
    tests = re.findall(r"Total number of tests run: (\d+)", text)
    suites = re.findall(r"Suites: completed (\d+), aborted (\d+)", text)
    if not tests or not suites:
        sys.exit(f"no scalatest summary in {log_path} — run a FULL sbt test first")
    if suites[-1][1] != "0":
        sys.exit(f"aborted suites in {log_path} — fix before syncing docs")
    return int(tests[-1]), int(suites[-1][0])


def sub_checked(pattern, repl, text, path):
    new, n = re.subn(pattern, repl, text)
    if n == 0:
        sys.exit(f"pattern not found in {path}: {pattern}")
    return new


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--test-log", required=True)
    args = ap.parse_args()

    q = query_count()
    t, s = test_counts(args.test_log)
    exact = q - len(BOUNDS_ORACLE_NAMES)

    cov_p = REPO / "COVERAGE.md"
    cov = cov_p.read_text()
    cov = sub_checked(r"\d+ driver-gate queries", f"{q} driver-gate queries", cov, cov_p)
    cov = sub_checked(r"oracle-backed — \d+(\s+)value-for-value",
                      rf"oracle-backed — {exact}\g<1>value-for-value", cov, cov_p)
    cov = sub_checked(r"plus \d+(\s+)scalatest checks across \d+ suites",
                      rf"plus {t}\g<1>scalatest checks across {s} suites", cov, cov_p)
    cov_p.write_text(cov)

    rd_p = REPO / "README.md"
    rd = rd_p.read_text()
    rd = sub_checked(r"\(\d+ queries, ALL DuckDB-oracle-backed: \d+ value-for-value",
                     f"({q} queries, ALL DuckDB-oracle-backed: {exact} value-for-value",
                     rd, rd_p)
    rd = sub_checked(r"# \d+ tests across \d+ suites",
                     f"# {t} tests across {s} suites", rd, rd_p)
    rd_p.write_text(rd)

    print(f"queries={q} (value-for-value={exact}, bounds={len(BOUNDS_ORACLE_NAMES)}) "
          f"tests={t} suites={s} — README.md + COVERAGE.md synced")


if __name__ == "__main__":
    main()
