#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query result parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same fixture tables,
sorts columns by name and rows by all values, and compares cell-by-cell
(exact for non-floats, 1e-9 relative tolerance for floats).
"""
import json, math, sys, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

con = duckdb.connect()
for t in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(t)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                rr.append(round(v, 6))
            elif isinstance(v, list):
                rr.append(tuple(v))
            else:
                rr.append(v)
        out.append(tuple(rr))
    return sorted(out, key=lambda x: tuple(str(e) for e in x)), [cols[i] for i in order]

def close(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return abs(a - b) <= 1e-6 * max(1.0, abs(a), abs(b))
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(close(x, y) for x, y in zip(a, b))
    return a == b

fails = 0
for q in sorted(oracle):
    res_dir = os.path.join(out_dir, q)
    if not os.path.isdir(res_dir):
        print(f"MISSING  {q}: no result dir")
        fails += 1
        continue
    got = con.execute(
        f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").fetchall()
    got_cols = [d[0] for d in con.description]
    try:
        want = con.execute(oracle[q]).fetchall()
        want_cols = [d[0] for d in con.description]
    except Exception as e:
        print(f"ORACLE-ERR {q}: {e}")
        fails += 1
        continue
    g, gc = canon(got, got_cols)
    w, wc = canon(want, want_cols)
    if gc != wc:
        print(f"SCHEMA   {q}: spark={gc} oracle={wc}")
        fails += 1
    elif len(g) != len(w):
        print(f"ROWCOUNT {q}: spark={len(g)} oracle={len(w)}")
        fails += 1
    else:
        bad = [(a, b) for a, b in zip(g, w) if not close(a, b)]
        if bad:
            print(f"VALUES   {q}: {len(bad)} mismatched rows; first: {bad[0]}")
            fails += 1
        else:
            print(f"OK       {q}: {len(g)} rows")
print("PASS" if fails == 0 else f"FAIL ({fails})")
sys.exit(1 if fails else 0)
