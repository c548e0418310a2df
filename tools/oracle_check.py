#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables, load the Spark result parquet, sort
columns by name and rows by value, and compare cell-by-cell (exact for
ints/strings, tiny epsilon report for floats). Usage:
  python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, glob, math
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok, bad = [], []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
        got = pd.read_parquet(f"{out_dir}/{name}")
    except Exception as e:
        bad.append((name, f"EXEC: {str(e).splitlines()[0][:120]}"))
        continue
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        bad.append((name, f"SCHEMA: oracle={list(exp.columns)} spark={list(got.columns)}"))
        continue
    if len(exp) != len(got):
        bad.append((name, f"ROWS: oracle={len(exp)} spark={len(got)}"))
        continue
    exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    mism = []
    for c in exp.columns:
        ev, gv = exp[c], got[c]
        for i in range(len(ev)):
            a, b = ev.iloc[i], gv.iloc[i]
            if isinstance(a, float) or isinstance(b, float):
                fa, fb = float(a), float(b)
                if fa != fb and not (math.isnan(fa) and math.isnan(fb)):
                    mism.append(f"{c}[{i}]: {fa!r} vs {gv.iloc[i]!r} (diff={fa-fb:.2e})")
            else:
                if str(a) != str(b):
                    mism.append(f"{c}[{i}]: {a!r} vs {b!r}")
            if len(mism) > 3:
                break
        if len(mism) > 3:
            break
    if mism:
        bad.append((name, "VALUES: " + "; ".join(mism[:4])))
    else:
        ok.append(name)

print(f"PASS {len(ok)}/{len(oracle)}: {' '.join(ok)}")
for name, why in bad:
    print(f"FAIL {name}: {why}")
sys.exit(0 if not bad else 1)
