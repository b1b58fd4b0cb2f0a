#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify output
against DuckDB oracles and compare exactly (columns sorted by name, rows
sorted, values compared cell-by-cell). Usage:
    python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    spark_df = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
    if name not in oracle:
        print(f"[rows-only] {name}: {len(spark_df)} rows")
        continue
    try:
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"[FAIL-sql ] {name}: oracle SQL error: {e}")
        fails += 1
        continue
    sd = spark_df[sorted(spark_df.columns)]
    dd = duck_df[sorted(duck_df.columns)]
    if list(sd.columns) != list(dd.columns):
        print(f"[FAIL-cols] {name}: spark={list(sd.columns)} duck={list(dd.columns)}")
        fails += 1
        continue
    if list(map(str, sd.dtypes)) != list(map(str, dd.dtypes)):
        print(f"[WARN-type] {name}: spark={list(map(str, sd.dtypes))} duck={list(map(str, dd.dtypes))}")
    sd = sd.sort_values(by=list(sd.columns)).reset_index(drop=True)
    dd = dd.sort_values(by=list(dd.columns)).reset_index(drop=True)
    if len(sd) != len(dd):
        print(f"[FAIL-rows] {name}: spark={len(sd)} duck={len(dd)}")
        fails += 1
        continue
    sd2 = sd.astype(str)
    dd2 = dd.astype(str)
    neq = (sd2 != dd2)
    if neq.any().any():
        ncell = int(neq.sum().sum())
        print(f"[FAIL-vals] {name}: {ncell} differing cells of {sd.size}")
        mask = neq.any(axis=1)
        print("  spark:", sd[mask].head(3).to_dict("records"))
        print("  duck :", dd[mask].head(3).to_dict("records"))
        fails += 1
    else:
        print(f"[OK       ] {name}: {len(sd)} rows x {len(sd.columns)} cols exact")

print(f"\n{fails} failures")
sys.exit(1 if fails else 0)
