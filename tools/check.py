#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: reads Verify output
(<out>/<name>/ parquet + oracle_sql.json), runs each oracle SQL in DuckDB over
the same sf dir, and compares results (columns sorted by name, rows sorted,
exact value compare with a tiny float tolerance report)."""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.sql(f"CREATE VIEW {name} AS FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, passes = [], []
for name, sql in sorted(oracle.items()):
    qdir = f"{out_dir}/{name}"
    if not os.path.isdir(qdir):
        fails.append((name, "no spark output")); continue
    try:
        got = con.sql(f"FROM '{qdir}/*.parquet'").df()
        exp = con.sql(sql).df()
    except Exception as e:
        fails.append((name, f"read/sql error: {e}")); continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        fails.append((name, f"schema: {list(got.columns)} vs {list(exp.columns)}")); continue
    if len(got) != len(exp):
        fails.append((name, f"rows: {len(got)} vs {len(exp)}")); continue
    gs = got.sort_values(by=list(got.columns), ignore_index=True)
    es = exp.sort_values(by=list(exp.columns), ignore_index=True)
    bad = None
    for c in gs.columns:
        a, b = gs[c], es[c]
        if a.dtype.kind == 'f' or b.dtype.kind == 'f':
            diff = (a - b).abs()
            if not ((a.isna() == b.isna()).all() and (diff.fillna(0) == 0).all()):
                mx = diff.max()
                bad = f"col {c}: max abs diff {mx}"
                break
        else:
            if not a.equals(b):
                neq = (a != b) & ~(a.isna() & b.isna())
                i = neq.idxmax()
                bad = f"col {c}: first diff at row {i}: {a[i]!r} vs {b[i]!r}"
                break
    if bad: fails.append((name, bad))
    else: passes.append(name)

print(f"PASS {len(passes)}/{len(oracle)}")
for n, why in fails:
    print(f"FAIL {n}: {why}")
sys.exit(1 if fails else 0)
