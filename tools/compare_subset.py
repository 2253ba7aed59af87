#!/usr/bin/env python3
"""Spot-check a subset of oracled queries (compare_oracle.py semantics,
names given on the command line) — used for sf0.1 checks where the full
oracle suite's recursive CTEs would take ~10 min in DuckDB."""
import json, sys, glob
import duckdb
import pandas as pd

sf_dir = sys.argv[1]
out_dir = sys.argv[2]
names = sys.argv[3:]

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
for name in names:
    if name not in oracle:
        print(f"NO-SQL   {name}")
        fails.append(name)
        continue
    if not glob.glob(f"{out_dir}/{name}/*.parquet"):
        print(f"MISSING  {name}")
        fails.append(name)
        continue
    got = canon(pd.read_parquet(f"{out_dir}/{name}"))
    want = canon(con.sql(oracle[name]).df())
    if got.shape != want.shape or list(got.columns) != list(want.columns):
        print(f"SHAPE    {name}: spark {got.shape} oracle {want.shape}")
        fails.append(name)
        continue
    # same astype(str) exact compare as compare_oracle.py
    bad = [c for c in got.columns
           if not (got[c].astype(str) == want[c].astype(str)).all()]
    if bad:
        print(f"VALUES   {name}: cols {bad}")
        for c in bad[:2]:
            d = got[c].astype(str) != want[c].astype(str)
            for i in d[d].index[:3]:
                print(f"   row{i} {c}: spark={got[c][i]!r} oracle={want[c][i]!r}")
        fails.append(name)
    else:
        print(f"OK       {name} rows={len(got)}")

print(f"\n{len(names) - len(fails)}/{len(names)} subset match")
sys.exit(1 if fails else 0)
