#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/verify_local.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` has already produced
<outDir>/<name>/ parquet dirs and <outDir>/oracle_sql.json. Registers every
fixture table as a DuckDB view over the sfDir parquet, runs each oracle SQL,
and compares with the Spark result: column names (sorted), row count, and a
canonicalized value-hash (rows sorted, floats rounded to 9 significant-ish
decimals to absorb sub-ulp engine differences the driver also tolerates —
if the driver is stricter, our queries already round explicitly).
"""
import glob
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    mat = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return mat


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

    results = {}
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            results[name] = "EMPTY-DUMP"
            continue
        sq = con.execute(f"SELECT * FROM '{d}/*.parquet'")
        scols = [c[0] for c in sq.description]
        srows = sq.fetchall()
        if name not in oracle:
            results[name] = f"rows-only ({len(srows)} rows)"
            continue
        try:
            oq = con.execute(oracle[name])
            ocols = [c[0] for c in oq.description]
            orows = oq.fetchall()
        except Exception as e:
            results[name] = f"ORACLE-ERROR: {e}"
            continue
        if sorted(scols) != sorted(ocols):
            results[name] = f"SCHEMA-MISMATCH spark={sorted(scols)} duck={sorted(ocols)}"
        elif len(srows) != len(orows):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(srows)} duck={len(orows)}"
        elif table_key(srows, scols) != table_key(orows, ocols):
            sk, ok = table_key(srows, scols), table_key(orows, ocols)
            diff = next((i for i, (a, b) in enumerate(zip(sk, ok)) if a != b), -1)
            results[name] = (f"HASH-MISMATCH first-diff-row={diff} "
                             f"spark={sk[diff] if diff >= 0 else '?'} "
                             f"duck={ok[diff] if diff >= 0 else '?'}")
        else:
            results[name] = f"OK ({len(srows)} rows)"

    bad = 0
    for k in sorted(results):
        ok = results[k].startswith(("OK", "rows-only"))
        bad += 0 if ok else 1
        print(f"{'PASS' if ok else 'FAIL':4} {k}: {results[k]}")
    print(f"\n{len(results) - bad}/{len(results)} pass")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
