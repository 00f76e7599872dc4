import duckdb, json, glob, os, sys
import pandas as pd

vout = sys.argv[1] if len(sys.argv) > 1 else '/tmp/vout'
sfdir = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.001'

con = duckdb.connect()
for p in glob.glob(f'{sfdir}/*.parquet'):
    name = os.path.basename(p).replace('.parquet', '')
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f'{vout}/oracle_sql.json'))
fails = []
for name, sql in sorted(oracle.items()):
    d = f'{vout}/{name}'
    if not os.path.isdir(d):
        fails.append((name, 'NO SPARK OUTPUT')); continue
    spark_df = pd.read_parquet(d)
    try:
        duck_df = con.execute(sql).df()
    except Exception as e:
        fails.append((name, f'DUCKDB ERROR: {e}')); continue
    s = spark_df[sorted(spark_df.columns)]
    k = duck_df[sorted(duck_df.columns)]
    if list(s.columns) != list(k.columns):
        fails.append((name, f'COLS spark={list(s.columns)} duck={list(k.columns)}')); continue
    if len(s) != len(k):
        fails.append((name, f'ROWS spark={len(s)} duck={len(k)}')); continue
    # exact cell compare (row order preserved)
    for c in s.columns:
        a, b = s[c].tolist(), k[c].tolist()
        bad = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y and not (pd.isna(x) and pd.isna(y))]
        if bad:
            fails.append((name, f'CELL col={c} first={bad[0]} nbad={len(bad)}'))
            break
    else:
        dtypes_s = [str(t) for t in s.dtypes]; dtypes_k = [str(t) for t in k.dtypes]
        note = '' if dtypes_s == dtypes_k else f'  [dtypes differ: {dtypes_s} vs {dtypes_k}]'
        print(f'OK   {name}  rows={len(s)}{note}')
for name, why in fails:
    print(f'FAIL {name}: {why}')
print(f'\n{len(oracle)-len(fails)}/{len(oracle)} queries match')
