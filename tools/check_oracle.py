#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare: for each query
in <outDir>/oracle_sql.json, run the SQL over the sf tables and compare
with the Spark parquet output (columns sorted by name, values hashed).

Usage: check_oracle.py <sfDir> <outDir>
"""
import sys, os, json, duckdb

sf, out = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(out, "oracle_sql.json")))

con = duckdb.connect()
# Cap DuckDB so heavy oracles (the x10 near-dup self-joins) spill to
# .tmp instead of getting OOM-killed alongside a Spark JVM.
con.execute(f"SET memory_limit='{os.environ.get('ORACLE_MEM', '40GB')}'")
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = os.path.join(sf, f"{t}.parquet")
    if os.path.isdir(p):  # Spark-written table: a directory of part files
        p = os.path.join(p, "*.parquet")
    elif not os.path.exists(p):
        continue
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def canon(rel):
    cols = sorted(rel.columns)
    df = rel.df()[cols]
    rows = []
    for r in df.itertuples(index=False):
        rows.append(tuple(round(v, 9) if isinstance(v, float) else
                          (tuple(v) if hasattr(v, "__iter__") and not isinstance(v, str) else v)
                          for v in r))
    return cols, sorted(map(repr, rows))

only = None
if len(sys.argv) > 3 and sys.argv[3] == "--only":
    only = set(sys.argv[4].split(","))
if len(sys.argv) > 3 and sys.argv[3] == "--skip-until":
    names = sorted(oracle)
    only = set(names[names.index(sys.argv[4]):])

fails = []
for name in sorted(oracle):
    if only is not None and name not in only:
        continue
    qdir = os.path.join(out, name)
    if not os.path.isdir(qdir):
        print(f"{name:28s} MISSING spark output"); fails.append(name); continue
    try:
        oc, orows = canon(con.sql(oracle[name]))
        sc_, srows = canon(con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')"))
        if oc != sc_:
            print(f"{name:28s} SCHEMA mismatch: oracle={oc} spark={sc_}"); fails.append(name)
        elif orows != srows:
            diff = [x for x in orows if x not in set(srows)][:3]
            diff2 = [x for x in srows if x not in set(orows)][:3]
            print(f"{name:28s} ROWS mismatch: {len(orows)} vs {len(srows)}; oracle-only={diff} spark-only={diff2}")
            fails.append(name)
        else:
            print(f"{name:28s} pass ({len(orows)} rows)")
    except Exception as e:
        print(f"{name:28s} ORACLE ERROR: {e}"); fails.append(name)

nq = len(oracle) if only is None else len(only)
print(f"\n{nq - len(fails)}/{nq} oracle queries pass; rows-only queries not checked here")
sys.exit(1 if fails else 0)
