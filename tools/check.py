#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]

1. Runs `sbt "runMain graft.Verify <sfDir> <outDir>"` (skip with --no-run).
2. For each query parquet in outDir, runs the matching oracle SQL from
   oracle_sql.json in DuckDB over the same sf tables.
3. Compares: schema (column names sorted), row count, and values
   (columns sorted by name, rows sorted by all columns, exact match;
   floats compared to 1e-9 relative as a fallback diagnostic).
"""
import json, os, subprocess, sys

import duckdb
import pandas as pd
import numpy as np

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main():
    if "--no-run" not in sys.argv:
        r = subprocess.run(
            ["sbt", f'runMain graft.Verify {SF_DIR} {OUT_DIR}'],
            cwd="/root/repo", capture_output=True, text=True)
        sys.stdout.write(r.stdout[-4000:])
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-4000:])
            sys.exit(1)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    with open(f"{OUT_DIR}/oracle_sql.json") as f:
        oracles = json.load(f)

    names = sorted(d for d in os.listdir(OUT_DIR)
                   if os.path.isdir(os.path.join(OUT_DIR, d)))
    n_pass = n_fail = 0
    for name in names:
        got = pd.read_parquet(os.path.join(OUT_DIR, name))
        if name not in oracles:
            print(f"  ~ {name}: rows-only check, rows={len(got)}")
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"  ✗ {name}: oracle SQL failed: {e}")
            n_fail += 1
            continue
        g, e = normalize(got), normalize(exp)
        if list(g.columns) != list(e.columns):
            print(f"  ✗ {name}: columns {list(g.columns)} != {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"  ✗ {name}: rows {len(g)} != {len(e)}")
            n_fail += 1
            continue
        bad = []
        for c in g.columns:
            gv, ev = g[c], e[c]
            if pd.api.types.is_float_dtype(gv) or pd.api.types.is_float_dtype(ev):
                a = gv.astype(float).to_numpy()
                b = ev.astype(float).to_numpy()
                eq = np.isclose(a, b, rtol=0, atol=0, equal_nan=True)
                if not eq.all():
                    close = np.isclose(a, b, rtol=1e-9, equal_nan=True)
                    bad.append((c, "float-exact" if close.all() else "float",
                                int((~eq).sum())))
            else:
                eq = (gv.astype(str) == ev.astype(str))
                if not eq.all():
                    bad.append((c, "value", int((~eq).sum())))
        if bad:
            print(f"  ✗ {name}: mismatch {bad}")
            try:  # diagnostic only — dtype quirks must not abort the run
                neq = ~(g.astype(str) == e.astype(str)).all(axis=1)
                i = next(iter(np.where(neq)[0][:1]), 0)
                print(f"      got[{i}]: {g.iloc[i].to_dict()}")
                print(f"      exp[{i}]: {e.iloc[i].to_dict()}")
            except Exception as ex:
                print(f"      (row diagnostic unavailable: {ex})")
            n_fail += 1
        else:
            print(f"  ✓ {name} ({len(g)} rows)")
            n_pass += 1
    missing = sorted(set(oracles) - set(names))
    if missing:
        print(f"  ! oracles with no result parquet: {missing}")
    print(f"PASS {n_pass} / FAIL {n_fail} / rows-only "
          f"{len(names) - n_pass - n_fail}")
    sys.exit(1 if n_fail or missing else 0)


if __name__ == "__main__":
    main()
