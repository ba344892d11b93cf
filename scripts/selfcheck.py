#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: runs DuckDB on
oracle_sql.json (written by graft.Verify) against the same parquet tables and
compares row counts, sorted-column value hashes, and schemas.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            expected = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        try:
            actual = duckdb.connect().execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        e, a = canon(expected), canon(actual)
        if list(e.columns) != list(a.columns):
            print(f"FAIL {name}: columns {list(a.columns)} != {list(e.columns)}")
            n_fail += 1
            continue
        if len(e) != len(a):
            print(f"FAIL {name}: rows {len(a)} != {len(e)}")
            n_fail += 1
            continue
        if not e.equals(a):
            neq = (e != a) & ~(e.isna() & a.isna())
            bad = neq.any(axis=1)
            print(f"FAIL {name}: {bad.sum()} mismatched rows; first:")
            idx = bad[bad].index[:3]
            print("  expected:", e.loc[idx].to_dict("records"))
            print("  actual  :", a.loc[idx].to_dict("records"))
            n_fail += 1
            continue
        print(f"PASS {name} ({len(a)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
