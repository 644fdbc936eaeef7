#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query dir in
OUT, run the matching oracle SQL from oracle_sql.json in DuckDB against
the same sf parquet tables, then compare (schema-insensitively: columns
sorted by name, rows compared in result order, BITWISE-exact values).

The value compare is byte-level, matching the driver's hash: floats are
compared on their IEEE-754 bit pattern (struct.pack '<d'), so -0.0 vs
+0.0 FAILS here exactly as it fails the driver (r12's t24 escape:
`-0.0 != 0.0` is False in Python, but the byte hashes differ). Run with
--selftest to prove the tool rejects a -0.0/+0.0 pair."""
import sys, json, glob, os, struct, math
import duckdb
import pandas as pd
import numpy as np


def canon(x):
    """Byte-faithful canonical form of one cell value."""
    if isinstance(x, (np.bool_, bool)):  # before int: bool <: int
        return ("b", bool(x))
    if isinstance(x, (float, np.floating)):
        return ("f64", struct.pack("<d", float(x)))
    if isinstance(x, (int, np.integer)):
        # one tag for Python int AND numpy scalar ints: object-dtype
        # Series.tolist() preserves numpy scalars, so equal integers
        # from different engines must not compare unequal by type
        return ("i", int(x))
    if isinstance(x, np.ndarray):
        return ("arr", tuple(canon(v) for v in x))
    if isinstance(x, (list, tuple)):
        return ("arr", tuple(canon(v) for v in x))
    return ("o", x)


def cells_equal(x, y):
    xna = x is None or (not isinstance(x, (np.ndarray, list, tuple)) and pd.isna(x))
    yna = y is None or (not isinstance(y, (np.ndarray, list, tuple)) and pd.isna(y))
    if xna or yna:
        # NaN == NaN bitwise (driver hashes a canonical NaN); null == null
        if xna and yna:
            xf = isinstance(x, (float, np.floating)) and math.isnan(x)
            yf = isinstance(y, (float, np.floating)) and math.isnan(y)
            return xf == yf or (xf and yf)
        return False
    return canon(x) == canon(y)


def selftest():
    assert cells_equal(0.0, 0.0)
    assert not cells_equal(-0.0, 0.0), "tool must reject -0.0 vs +0.0"
    assert not cells_equal(0.0, -0.0)
    assert cells_equal(-0.0, -0.0)
    assert cells_equal(float("nan"), float("nan"))
    assert cells_equal(3, 3) and not cells_equal(3, 4)
    assert cells_equal(3, np.int64(3)), "int vs np.integer must be equal"
    assert cells_equal(np.int32(3), np.int64(3))
    assert not cells_equal(True, 1) and not cells_equal(np.bool_(True), 1)
    assert cells_equal([1.0, -0.0], [1.0, -0.0])
    assert not cells_equal([1.0, -0.0], [1.0, 0.0])
    print("selftest OK (bitwise compare rejects -0.0 vs +0.0)")


if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
    selftest(); sys.exit(0)

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name in sorted(oracle):
    if only is not None and name not in only:
        continue
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
    # bitwise value compare, in order
    mismatch = None
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if not cells_equal(x, y):
                mismatch = f"col {c} row {i}: spark={x!r} duck={y!r}"
                break
        if mismatch: break
    if mismatch:
        fails.append((name, mismatch))
    else:
        print(f"  OK {name} ({len(a)} rows)")
if only is not None:
    # a key filter naming keys absent from oracle_sql.json (stale
    # classes, a typo) must fail LOUDLY, not report a vacuous pass —
    # a stale-build run once printed ALL MATCH having checked nothing
    missing = only - set(oracle)
    if missing:
        print(f"\nFILTERED KEYS NOT IN oracle_sql.json "
              f"(stale build?): {sorted(missing)}")
        sys.exit(1)
if fails:
    print(f"\n{len(fails)} FAILURES:")
    for n, m in fails: print(f"  FAIL {n}: {m}")
    sys.exit(1)
print("\nALL MATCH (bitwise)")
