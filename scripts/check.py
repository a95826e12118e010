#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet written by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB over the same test tables, and
compares (columns sorted by name, rows sorted by all columns, exact values).
Dev-only tooling — the shipped Scala library does not depend on this.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify to dodge dtype differences (int32 vs int64, ts units)
    for c in df.columns:
        df[c] = df[c].map(lambda v: repr(v))
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_noracle = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(qdir):
            continue
        name = os.path.basename(qdir)
        spark_df = pd.read_parquet(qdir)
        if name not in oracles:
            n_noracle += 1
            print(f"  {name:28s} NO-ORACLE rows={len(spark_df)}")
            continue
        try:
            oracle_df = con.sql(oracles[name]).df()
        except Exception as e:
            n_fail += 1
            print(f"  {name:28s} ORACLE-SQL-ERROR {str(e).splitlines()[0][:120]}")
            continue
        a, b = canon(spark_df), canon(oracle_df)
        if list(a.columns) != list(b.columns):
            n_fail += 1
            print(f"  {name:28s} SCHEMA-MISMATCH spark={list(a.columns)} oracle={list(b.columns)}")
        elif len(a) != len(b):
            n_fail += 1
            print(f"  {name:28s} ROWCOUNT spark={len(a)} oracle={len(b)}")
        elif not a.equals(b):
            n_fail += 1
            diff = (a != b).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"  {name:28s} VALUE-MISMATCH ({int(diff.sum())}/{len(a)} rows)")
            for i in idx:
                print(f"    row {i}: spark={a.loc[i].to_dict()}")
                print(f"            oracle={b.loc[i].to_dict()}")
        else:
            n_pass += 1
            print(f"  {name:28s} OK rows={len(a)}")
    print(f"\nPASS {n_pass}  FAIL {n_fail}  NO-ORACLE {n_noracle}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
