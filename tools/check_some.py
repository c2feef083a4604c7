#!/usr/bin/env python3
"""Targeted variant of check.py: compare only the queries whose result
directories exist under out_dir (i.e. whatever a SPARK_GRAFT_ONLY-filtered
graft.Verify run dumped), instead of every oracle entry."""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
dumped = set(p.split("/")[-1] for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p))
fails = 0
for name in sorted(dumped):
    if name not in oracle:
        print(f"rows-only (no oracle): {name}")
        continue
    try:
        exp = con.sql(oracle[name]).df()
        got = pd.concat([pd.read_parquet(f) for f in
                         sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))])
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: cols exp={list(exp.columns)} got={list(got.columns)}")
            fails += 1
            continue
        exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            fails += 1
            continue
        mism = []
        for c in exp.columns:
            e, g = exp[c], got[c]
            if e.dtype.kind == 'f' or g.dtype.kind == 'f':
                bad = ~((e.isna() & g.isna()) | (e == g))
            else:
                bad = e.astype(str) != g.astype(str)
            if bad.any():
                mism.append((c, int(bad.sum()), e[bad].head(3).tolist(), g[bad].head(3).tolist()))
        if mism:
            print(f"FAIL {name}: value mismatches {mism}")
            fails += 1
        else:
            print(f"ok   {name}: {len(got)} rows")
    except Exception as ex:
        print(f"FAIL {name}: {type(ex).__name__}: {ex}")
        fails += 1
sys.exit(1 if fails else 0)
