#!/usr/bin/env python3
"""Self-check: mimic the driver's DuckDB-oracle compare.

Reads each Spark result at OUT_DIR/<name>/ (parquet), runs the matching
oracle SQL from OUT_DIR/oracle_sql.json in DuckDB over SF_DIR's tables,
sorts columns by name, sorts rows, and compares values.
"""
import json, sys, glob
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = []
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"MISSING  {name}")
        fails.append(name)
        continue
    try:
        got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        want = canon(con.sql(sql).df())
    except Exception as e:
        print(f"ERROR    {name}: {e}")
        fails.append(name)
        continue
    if list(got.columns) != list(want.columns):
        print(f"COLS     {name}: spark={list(got.columns)} oracle={list(want.columns)}")
        fails.append(name)
        continue
    if len(got) != len(want):
        print(f"ROWS     {name}: spark={len(got)} oracle={len(want)}")
        fails.append(name)
        continue
    # dtype check (informational) + exact value compare
    mismatch_cols = []
    for c in got.columns:
        g, w = got[c], want[c]
        try:
            eq = (g.astype(str) == w.astype(str)).all()
        except Exception:
            eq = False
        if not eq:
            mismatch_cols.append(c)
    dt = [c for c in got.columns if str(got[c].dtype) != str(want[c].dtype)]
    if mismatch_cols:
        print(f"VALUES   {name}: cols {mismatch_cols}")
        for c in mismatch_cols[:2]:
            d = got[c].astype(str) != want[c].astype(str)
            idx = d[d].index[:3]
            for i in idx:
                print(f"   row{i} {c}: spark={got[c][i]!r} oracle={want[c][i]!r}")
        fails.append(name)
    else:
        note = f" (dtype diff: {[(c, str(got[c].dtype), str(want[c].dtype)) for c in dt]})" if dt else ""
        print(f"OK       {name} rows={len(got)}{note}")

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} oracled queries match")
sys.exit(1 if fails else 0)
