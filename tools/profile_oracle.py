#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB (no Spark compare) — finds the mirrors that
blow the driver's correctness budget. Usage:
    python3 tools/profile_oracle.py [sf_dir] [oracle_sql.json] [only,names]
Prints per-query seconds sorted slowest-first plus the total."""
import sys, json, time
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout_meta/oracle_sql.json"
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(oracle_path))
times = []
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    t0 = time.time()
    try:
        con.sql(sql).df()
        times.append((time.time() - t0, name, "ok"))
    except Exception as ex:
        times.append((time.time() - t0, name, f"ERR {type(ex).__name__}"))
    print(f"{times[-1][0]:8.2f}s {name} {times[-1][2]}", flush=True)

print("\n=== slowest first ===")
for t, name, st in sorted(times, reverse=True)[:30]:
    print(f"{t:8.2f}s {name} {st}")
print(f"TOTAL {sum(t for t, _, _ in times):.1f}s over {len(times)} queries")
