#!/usr/bin/env python3
"""Cross-parallelism determinism gate: run graft.Verify twice at
different SPARK_GRAFT_CPUS into two dirs, then compare every query's
parquet output byte-for-byte (columns sorted by name, rows in dump
order). Any mismatch means an operator's result depends on
partitioning — a bug at 1000 executors even if the DuckDB oracle
passes locally.

Usage: check_determinism.py <outDirA> <outDirB>
"""
import glob, hashlib, os, sys
import pandas as pd

a_dir, b_dir = sys.argv[1], sys.argv[2]

def digest(d):
    out = {}
    for q in sorted(os.listdir(d)):
        p = os.path.join(d, q)
        if not os.path.isdir(p):
            continue
        df = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(p + "/*.parquet"))],
                       ignore_index=True)
        csv = df.reindex(sorted(df.columns), axis=1).to_csv(index=False)
        out[q] = hashlib.md5(csv.encode()).hexdigest()
    return out

a, b = digest(a_dir), digest(b_dir)
keys = sorted(set(a) | set(b))
bad = [q for q in keys if a.get(q) != b.get(q)]
for q in keys:
    print(f"  {'MISMATCH' if q in bad else 'OK'} {q}")
if bad:
    print(f"\n{len(bad)} PARTITIONING-DEPENDENT QUERIES: {bad}")
    sys.exit(1)
print(f"\nALL {len(keys)} DETERMINISTIC")
