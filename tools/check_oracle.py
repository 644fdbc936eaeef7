#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query dir in
OUT, run the matching oracle SQL from oracle_sql.json in DuckDB against
the same sf parquet tables, then compare (schema-insensitively: columns
sorted by name, rows compared in result order and also as sorted
multisets, exact values)."""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name in sorted(oracle):
    path = f"{out_dir}/{name}"
    if not os.path.isdir(path):
        fails.append((name, "NO SPARK OUTPUT")); continue
    spark_df = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{path}/*.parquet"))], ignore_index=True)
    try:
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"ORACLE SQL ERROR: {e}")); continue
    a = spark_df.reindex(sorted(spark_df.columns), axis=1)
    b = duck_df.reindex(sorted(duck_df.columns), axis=1)
    if list(a.columns) != list(b.columns):
        fails.append((name, f"COLS spark={list(a.columns)} duck={list(b.columns)}")); continue
    if len(a) != len(b):
        fails.append((name, f"ROWS spark={len(a)} duck={len(b)}")); continue
    # exact value compare, in order
    mismatch = None
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if pd.isna(x) and pd.isna(y):
                continue
            if x != y:
                mismatch = f"col {c} row {i}: spark={x!r} duck={y!r}"
                break
        if mismatch: break
    if mismatch:
        fails.append((name, mismatch))
    else:
        print(f"  OK {name} ({len(a)} rows)")
if fails:
    print(f"\n{len(fails)} FAILURES:")
    for n, m in fails: print(f"  FAIL {n}: {m}")
    sys.exit(1)
print("\nALL MATCH")
