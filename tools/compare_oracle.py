#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB correctness gate:
run each oracle SQL against the sf tables, compare to the Spark parquet dump
(columns sorted by name, rows sorted, values stringified)."""
import json, sys, glob
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, passes, rows_only = [], [], []
for name in sorted(glob.glob(f"{out_dir}/q_*")):
    qname = name.split("/")[-1]
    spark_files = glob.glob(f"{name}/*.parquet")
    if not spark_files:
        fails.append((qname, "no spark output")); continue
    sdf = con.sql(f"SELECT * FROM '{name}/*.parquet'").df()
    if qname not in oracle:
        rows_only.append((qname, len(sdf)))
        continue
    try:
        odf = con.sql(oracle[qname]).df()
    except Exception as e:
        fails.append((qname, f"oracle SQL error: {e}")); continue
    # driver-style compare: sort columns by name, stringify, sort rows
    def norm(df):
        df = df[sorted(df.columns)]
        vals = df.astype(str).values.tolist()
        vals.sort()
        return [tuple(df.columns)] + vals
    a, b = norm(sdf), norm(odf)
    if list(a[0]) != list(b[0]):
        fails.append((qname, f"schema: spark={a[0]} duck={b[0]}"))
    elif len(a) != len(b):
        fails.append((qname, f"rowcount: spark={len(a)-1} duck={len(b)-1}"))
    elif a[1:] != b[1:]:
        diff = next((i, x, y) for i, (x, y) in enumerate(zip(a[1:], b[1:])) if x != y)
        fails.append((qname, f"values differ at sorted row {diff[0]}: spark={diff[1]} duck={diff[2]}"))
    else:
        # dtype check (schema compare)
        st = [str(t) for t in sdf[sorted(sdf.columns)].dtypes]
        ot = [str(t) for t in odf[sorted(odf.columns)].dtypes]
        if st != ot:
            fails.append((qname, f"dtype: spark={st} duck={ot}"))
        else:
            passes.append((qname, len(sdf)))

print(f"PASS ({len(passes)}):")
for q, n in passes: print(f"  {q}: {n} rows")
print(f"ROWS-ONLY ({len(rows_only)}):")
for q, n in rows_only: print(f"  {q}: {n} rows")
print(f"FAIL ({len(fails)}):")
for q, msg in fails: print(f"  {q}: {msg[:300]}")
sys.exit(1 if fails else 0)
