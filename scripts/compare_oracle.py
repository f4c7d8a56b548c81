#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate: for each
query dump under OUTDIR, run the oracle SQL on the same parquet tables
and compare (sorted columns, sorted rows, exact values)."""
import sys, json, glob
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.astype(str))
    return df

fails = []
for name in sorted(oracle):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails.append(name); continue
    spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    try:
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails.append(name); continue
    s, d = canon(spark_df), canon(duck_df)
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: columns {list(s.columns)} vs {list(d.columns)}"); fails.append(name); continue
    if len(s) != len(d):
        print(f"FAIL {name}: rows {len(s)} vs {len(d)}"); fails.append(name); continue
    mismatch = None
    for c in s.columns:
        sv, dv = s[c], d[c]
        if str(sv.dtype) != str(dv.dtype):
            # numeric compare across dtypes, but record it
            pass
        eq = (sv.astype(str).values == dv.astype(str).values)
        if not eq.all():
            i = int((~eq).argmax())
            mismatch = (c, str(sv.dtype), str(dv.dtype), sv.values[i], dv.values[i], i)
            break
    if mismatch:
        c, sd, dd, a, b, i = mismatch
        print(f"FAIL {name}: col {c} ({sd} vs {dd}) row {i}: spark={a!r} duck={b!r}")
        fails.append(name)
    else:
        dtypes = {c: (str(s[c].dtype), str(d[c].dtype)) for c in s.columns
                  if str(s[c].dtype) != str(d[c].dtype)}
        note = f" dtypes-differ:{dtypes}" if dtypes else ""
        print(f"PASS {name} ({len(s)} rows){note}")
print("FAILED:", fails if fails else "none")
sys.exit(1 if fails else 0)
