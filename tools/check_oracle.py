#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py [sf_dir] [verify_out_dir] [--json out.json]

With --json, also writes a per-query record in the driver's
CORRECTNESS_r{N}.json format ({name: {rows_match, schema_match,
hash_match, spark_rows, oracle_rows, err}}) — the self-recorded
snapshot (CORRECTNESS_SELF.json) committed each round so an empty or
unparsed driver artifact never leaves the repo unable to prove its
correctness.

For each query result parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB (tables = parquet files in sf_dir),
sorts columns by name and rows by all columns, and compares values.
"""
import json
import sys

import duckdb
import pandas as pd

ARGS = list(sys.argv[1:])
JSON_OUT = None
if "--json" in ARGS:
    i = ARGS.index("--json")
    JSON_OUT = ARGS[i + 1]
    del ARGS[i:i + 2]
SF = ARGS[0] if len(ARGS) > 0 else "/root/testdata/sf0.01"
OUT = ARGS[1] if len(ARGS) > 1 else "/tmp/verify_out"
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
    records = {}

    def rec(name, rows=False, schema=False, values=False,
            sr=None, orr=None, err=None):
        records[name] = {"rows_match": rows, "schema_match": schema,
                         "hash_match": values, "spark_rows": sr,
                         "oracle_rows": orr, "err": err}

    for name, sql in sorted(oracle.items()):
        try:
            got = canon(
                run_retry(con, f"SELECT * FROM '{OUT}/{name}/*.parquet'"))
            want = canon(run_retry(con, sql))
            if list(got.columns) != list(want.columns):
                print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
                rec(name, rows=len(got) == len(want), sr=len(got), orr=len(want))
                n_fail += 1
                continue
            if len(got) != len(want):
                print(f"FAIL {name}: rows {len(got)} != {len(want)}")
                rec(name, schema=True, sr=len(got), orr=len(want))
                n_fail += 1
                continue
            if not got.equals(want):
                neq = (got != want) & ~(got.isna() & want.isna())
                bad = neq.any(axis=1)
                print(f"FAIL {name}: {int(bad.sum())}/{len(got)} rows differ; first:")
                print(pd.concat([got[bad].head(2), want[bad].head(2)]))
                rec(name, rows=True, schema=True, sr=len(got), orr=len(want))
                n_fail += 1
                continue
            print(f"PASS {name} ({len(got)} rows)")
            rec(name, rows=True, schema=True, values=True,
                sr=len(got), orr=len(want))
            n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            rec(name, err=str(e))
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    if JSON_OUT:
        with open(JSON_OUT, "w") as f:
            json.dump(records, f, indent=1, sort_keys=True)
        print(f"wrote {JSON_OUT} ({len(records)} queries)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
