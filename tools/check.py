#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [jsonOut]

Reads oracle_sql.json + per-query parquet dirs produced by graft.Verify,
runs each oracle SQL in DuckDB over views named after the parquet tables,
and compares: row count, column names/dtypes (after sorting columns by
name), and exact cell values (rows sorted by all columns).

With jsonOut, also writes a per-query artifact in the driver's
CORRECTNESS_r{N}.json shape (rows/schema/hash match + row counts + err).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str, json_out: str = None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    report = {}
    for name, sql in sorted(oracles.items()):
        try:
            spark_df = canon(con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf())
            duck_df = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: exception {e}", flush=True)
            n_fail += 1
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": None,
                            "oracle_rows": None, "err": str(e)[:500]}
            continue
        status, details = "OK", []
        if list(spark_df.columns) != list(duck_df.columns):
            status = "FAIL"
            details.append(f"columns spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
        elif len(spark_df) != len(duck_df):
            status = "FAIL"
            details.append(f"rows spark={len(spark_df)} duck={len(duck_df)}")
        else:
            dtypes_differ = [
                (c, str(spark_df[c].dtype), str(duck_df[c].dtype))
                for c in spark_df.columns
                if str(spark_df[c].dtype) != str(duck_df[c].dtype)]
            if dtypes_differ:
                details.append(f"dtypes differ (warn): {dtypes_differ}")
                for c, _, _ in dtypes_differ:
                    try:
                        spark_df[c] = spark_df[c].astype(duck_df[c].dtype)
                    except Exception:
                        pass
            try:
                eq = spark_df.equals(duck_df)
            except Exception:
                eq = False
            if not eq:
                # pinpoint first mismatching cell
                status = "FAIL"
                for c in spark_df.columns:
                    a, b = spark_df[c], duck_df[c]
                    neq = ~((a == b) | (a.isna() & b.isna()))
                    if neq.any():
                        i = neq.idxmax()
                        details.append(f"col {c} row {i}: spark={a[i]!r} duck={b[i]!r} "
                                       f"({int(neq.sum())} cells differ)")
                        break
        print(f"{status:4} {name}: {len(spark_df)} rows" +
              ("  | " + "; ".join(details) if details else ""), flush=True)
        if status == "FAIL":
            n_fail += 1
        report[name] = {
            "rows_match": len(spark_df) == len(duck_df),
            "schema_match": list(spark_df.columns) == list(duck_df.columns),
            "hash_match": status == "OK",
            "spark_rows": len(spark_df), "oracle_rows": len(duck_df),
            "err": "; ".join(details) if status == "FAIL" and details else None}
    print(f"\n{len(oracles) - n_fail}/{len(oracles)} queries match")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=1)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
