#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
loads each query's parquet dump, runs the matching oracle SQL in
DuckDB over the same source tables, and compares (columns sorted by
name, rows sorted, exact match; floats reported when off by >1e-9).

Usage: python3 scripts/verify_local.py <sfDir> <outDir>
"""
import glob
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures = 0
    for name in sorted(oracles):
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output at {res_dir}")
            failures += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{files[0]}')").fetchdf()
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        w = want.sort_values(by=list(want.columns)).reset_index(drop=True)
        mismatch = None
        for c in got.columns:
            gv, wv = g[c], w[c]
            try:
                import pandas as pd
                if str(gv.dtype).startswith("float") or str(wv.dtype).startswith("float"):
                    # EXACT equality — the driver hashes values, it does
                    # not tolerance-compare; drift here means a driver FAIL
                    bad = (gv != wv) & ~(gv.isna() & wv.isna())
                else:
                    bad = gv.astype(str) != wv.astype(str)
                if bad.any():
                    i = bad.idxmax()
                    mismatch = f"col {c} row {i}: got={gv[i]!r} want={wv[i]!r}"
                    break
            except Exception as e:
                mismatch = f"col {c}: compare error {e}"
                break
        if mismatch:
            print(f"FAIL {name}: {mismatch}")
            failures += 1
        else:
            print(f"PASS {name} ({len(got)} rows, {len(got.columns)} cols)")

    print(f"\n{len(oracles) - failures}/{len(oracles)} oracle queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
