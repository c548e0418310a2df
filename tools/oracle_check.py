#!/usr/bin/env python3
"""Cross-check graft.Verify output against the DuckDB oracle.

Usage: python3 tools/oracle_check.py [sf_dir] [verify_out]
Defaults: /root/testdata/sf0.001 /tmp/verify_out

Mirrors the driver's comparison: sort columns by name, sort rows, compare
values (numeric with 1e-9 tolerance). Queries without oracle SQL are
reported as rows-only.
"""
import sys, json
import duckdb
import numpy as np

TABLES = ["lineitem", "orders", "customer", "nation", "region", "part",
          "supplier", "events", "documents", "embeddings"]

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    bad = []
    for name, sql in sorted(oracle.items()):
        try:
            odf = con.execute(sql).fetchdf()
            sdf = duckdb.connect().execute(
                f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchdf()
            ocols = sorted(odf.columns); scols = sorted(sdf.columns)
            if ocols != scols:
                bad.append((name, f"schema {scols} vs {ocols}")); continue
            o = odf[ocols].sort_values(ocols).reset_index(drop=True)
            s = sdf[ocols].sort_values(ocols).reset_index(drop=True)
            if len(o) != len(s):
                bad.append((name, f"rows {len(s)} vs {len(o)}")); continue
            for c in ocols:
                if o[c].dtype.kind in "fc" or s[c].dtype.kind in "fc":
                    if not np.allclose(o[c].astype(float), s[c].astype(float),
                                       rtol=1e-9, atol=1e-9, equal_nan=True):
                        bad.append((name, f"values differ in {c}")); break
                else:
                    if not (o[c].astype(str) == s[c].astype(str)).all():
                        bad.append((name, f"values differ in {c}")); break
        except Exception as e:
            bad.append((name, f"ERR {str(e)[:200]}"))
    print(("FAIL " if bad else "ALL MATCH ") + f"{len(oracle)} oracled queries")
    for n, m in bad:
        print(" ", n, m)
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
