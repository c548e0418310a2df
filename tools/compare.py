#!/usr/bin/env python3
"""Local replica of the driver's correctness compare: for each query dumped
by graft.Verify, run its oracle SQL in DuckDB over the same parquet tables
and compare row count, sorted schema, and value hash (columns sorted by
name, rows sorted by all columns). Usage: compare.py <verifyOut> <sfDir>."""
import duckdb, json, sys, glob, os

out, sf = sys.argv[1], sys.argv[2]
oracles = json.load(open(os.path.join(out, 'oracle_sql.json')))
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    p = f'{sf}/{t}.parquet'
    if os.path.exists(p):
        con.execute(f"create view {t} as select * from '{p}'")

fail = 0
for qdir in sorted(glob.glob(os.path.join(out, 'q*'))):
    name = os.path.basename(qdir)
    if name not in oracles:
        print(f'{name}: no_oracle')
        continue
    try:
        spark = con.sql(f"select * from '{qdir}/*.parquet'")
        oracle = con.sql(oracles[name])
        scols = sorted(spark.columns)
        ocols = sorted(oracle.columns)
        sdf = spark.df()[scols].sort_values(scols).reset_index(drop=True)
        odf = oracle.df()[ocols].sort_values(ocols).reset_index(drop=True)
        rows = len(sdf) == len(odf)
        schema = scols == ocols
        same = rows and schema and all(
            str(sdf.iat[i, j]) == str(odf.iat[i, j])
            for i in range(len(sdf)) for j in range(len(scols)))
        status = 'OK' if same else 'MISMATCH'
        if not same:
            fail += 1
            print(f'{name}: {status} rows={rows} schema={schema}')
            if not schema:
                print('  spark:', scols, '\n  oracle:', ocols)
            else:
                print('  spark:\n', sdf.head(20))
                print('  oracle:\n', odf.head(20))
        else:
            print(f'{name}: OK')
    except Exception as e:
        fail += 1
        print(f'{name}: ERROR {e}')
sys.exit(1 if fail else 0)
