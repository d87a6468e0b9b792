#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py [sf_dir] [verify_out_dir]

For each query result parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB (tables = parquet files in sf_dir),
sorts columns by name and rows by all columns, and compares values.
"""
import json
import sys

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def run_retry(con, sql: str) -> pd.DataFrame:
    """One retry on DuckDB's transient 'Out of Memory Error ... bad
    allocation' — seen on this container when a just-exited JVM still
    holds commit charge; the rerun a moment later always succeeds."""
    try:
        return con.sql(sql).df()
    except duckdb.Error as e:
        if "Out of Memory" not in str(e):
            raise
        import time
        time.sleep(10)
        return con.sql(sql).df()


def main() -> int:
    con = duckdb.connect()
    # bound the allocation appetite: 32 threads' concurrent operator
    # buffers are what collide with lingering JVM commit charge
    con.execute("SET threads=8")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(
                run_retry(con, f"SELECT * FROM '{OUT}/{name}/*.parquet'"))
            want = canon(run_retry(con, sql))
            if list(got.columns) != list(want.columns):
                print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
                n_fail += 1
                continue
            if len(got) != len(want):
                print(f"FAIL {name}: rows {len(got)} != {len(want)}")
                n_fail += 1
                continue
            if not got.equals(want):
                neq = (got != want) & ~(got.isna() & want.isna())
                bad = neq.any(axis=1)
                print(f"FAIL {name}: {int(bad.sum())}/{len(got)} rows differ; first:")
                print(pd.concat([got[bad].head(2), want[bad].head(2)]))
                n_fail += 1
                continue
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
