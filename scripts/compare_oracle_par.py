#!/usr/bin/env python3
"""Parallel variant of compare_oracle.py for the heavy sf0.1 sweep:
one worker process (own DuckDB connection) per query, results merged
into a driver-format CORRECTNESS json (rows_match/schema_match/
hash_match per query) plus the familiar PASS/FAIL lines.

Usage: compare_oracle_par.py SFDIR OUTDIR [JSON_OUT] [WORKERS]
"""
import os, sys, json, glob, time
from concurrent.futures import ProcessPoolExecutor

SFDIR, OUTDIR = sys.argv[1], sys.argv[2]
JSON_OUT = sys.argv[3] if len(sys.argv) > 3 else None
WORKERS = int(sys.argv[4]) if len(sys.argv) > 4 else 8

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_one(item):
    name, sql = item
    import duckdb
    import pandas as pd
    t0 = time.time()
    rec = {"rows_match": None, "schema_match": None, "hash_match": None,
           "spark_rows": None, "oracle_rows": None, "err": None}
    files = glob.glob(f"{OUTDIR}/{name}/*.parquet")
    if not files:
        rec["err"] = "no spark output"
        return name, rec, time.time() - t0
    spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    rec["spark_rows"] = int(len(spark_df))
    con = duckdb.connect()
    con.execute("SET threads=4")  # 8 workers x 4 threads = the box
    for t in TABLES:
        # driver testdata is a single file; GenData decades (sf1/sf10)
        # are Spark part-file directories — read either layout
        p = f"{SFDIR}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    try:
        duck_df = con.execute(sql).fetchdf()
    except Exception as e:
        rec["err"] = f"oracle error {e}"
        return name, rec, time.time() - t0
    rec["oracle_rows"] = int(len(duck_df))

    def canon(df):
        df = df[sorted(df.columns)]
        return df.sort_values(by=list(df.columns), ignore_index=True,
                              key=lambda s: s.astype(str))
    s, d = canon(spark_df), canon(duck_df)
    rec["schema_match"] = list(s.columns) == list(d.columns)
    rec["rows_match"] = len(s) == len(d)
    if rec["schema_match"] and rec["rows_match"]:
        rec["hash_match"] = all(
            (s[c].astype(str).values == d[c].astype(str).values).all()
            for c in s.columns)
    else:
        rec["hash_match"] = False
    return name, rec, time.time() - t0


def main():
    oracle = json.load(open(f"{OUTDIR}/oracle_sql.json"))
    results = {}
    fails = []
    with ProcessPoolExecutor(max_workers=WORKERS) as pool:
        for name, rec, secs in pool.map(run_one, sorted(oracle.items())):
            results[name] = rec
            ok = rec["hash_match"] and rec["schema_match"] and rec["rows_match"]
            if ok:
                print(f"PASS {name} ({rec['spark_rows']} rows) [{secs:.1f}s]", flush=True)
            else:
                print(f"FAIL {name}: {rec} [{secs:.1f}s]", flush=True)
                fails.append(name)
    if JSON_OUT:
        with open(JSON_OUT, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
    print("FAILED:", fails if fails else "none")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
