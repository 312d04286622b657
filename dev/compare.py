#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare."""
import sys, json, glob, hashlib
import duckdb, pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_r10a"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for r in df.itertuples(index=False):
        vals = []
        for v in r:
            if v is None or (isinstance(v, float) and pd.isna(v)):
                vals.append("NULL")
            elif isinstance(v, float):
                vals.append(repr(v))
            else:
                vals.append(str(v))
        rows.append("|".join(vals))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest(), len(df), sorted(df.columns)

fail = 0
for name in sorted(oracle):
    d = f"{out}/{name}"
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        continue
    sdf = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    try:
        odf = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE ERROR {str(e)[:100]}"); fail += 1; continue
    sh, sn, sc = canon(sdf)
    oh, on, oc = canon(odf)
    ok = sh == oh and sn == on and sc == oc
    if not ok:
        fail += 1
        print(f"{name}: MISMATCH rows {sn}/{on} cols {sc}=={oc} hash {sh==oh}")
    else:
        print(f"{name}: ok ({sn} rows)")
print("FAILURES:", fail)
