#!/usr/bin/env python3
"""Run every oracle SQL in DuckDB alone (no Spark) to catch dialect errors fast.

Usage: python3 tools/oracle_smoke.py <sfDir> <oracle_sql.json>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

sf_dir, path = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
fails = 0
for name, sql in sorted(json.load(open(path)).items()):
    try:
        n = len(con.execute(sql).fetchall())
        print(f"OK   {name}: {n} rows")
    except Exception as e:
        fails += 1
        print(f"FAIL {name}: {str(e)[:300]}")
sys.exit(1 if fails else 0)
