import duckdb, json, glob, os, sys
import pyarrow.parquet as pq

sf = '/root/testdata/sf0.01'
out = '/tmp/verify_out'
con = duckdb.connect()
con.execute("SET memory_limit='16GB'")
con.execute("SET temp_directory='/tmp/ducktmp'")
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracles = json.load(open(f'{out}/oracle_sql.json'))
results = {}
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d): continue
    spark_df = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')").fetchdf()
    if name not in oracles:
        results[name] = f'rows-only ({len(spark_df)} rows)'
        continue
    try:
        ora = con.execute(oracles[name]).fetchdf()
    except Exception as e:
        results[name] = f'ORACLE SQL ERROR: {e}'
        continue
    # driver-style compare: sort columns by name, sort rows, compare values
    a = spark_df[sorted(spark_df.columns)].sort_values(sorted(spark_df.columns)).reset_index(drop=True)
    b = ora[sorted(ora.columns)].sort_values(sorted(ora.columns)).reset_index(drop=True)
    if list(a.columns) != list(b.columns):
        results[name] = f'SCHEMA MISMATCH spark={list(a.columns)} oracle={list(b.columns)}'
        continue
    if len(a) != len(b):
        results[name] = f'ROWCOUNT MISMATCH spark={len(a)} oracle={len(b)}'
        continue
    try:
        import pandas as pd
        eq = a.astype(str).equals(b.astype(str))
    except Exception as e:
        eq = False
    if eq:
        results[name] = 'MATCH'
    else:
        diff = (a.astype(str) != b.astype(str)).any(axis=1)
        nd = int(diff.sum())
        results[name] = f'VALUE MISMATCH ({nd}/{len(a)} rows differ); first: spark={a[diff].head(2).to_dict()} oracle={b[diff].head(2).to_dict()}'
for k, v in results.items():
    print(f'{k}: {v[:500]}')
