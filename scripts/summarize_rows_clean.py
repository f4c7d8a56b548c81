#!/usr/bin/env python3
"""Rows-clean sweep artifact: per-query row count (>0 = clean) + wall
seconds parsed from the Verify stderr log. Used for the sf1 scale-decade
artifact, where DuckDB oracle replays (all-pairs shingle joins) are
impractical and the driver contract is rows-clean.

Usage: summarize_rows_clean.py <verifyOutDir> <sweepLog> <jsonOut> [sfLabel]
"""
import glob
import json
import re
import sys

import pyarrow.parquet as pq

out_dir, log_path, json_out = sys.argv[1], sys.argv[2], sys.argv[3]
sf = sys.argv[4] if len(sys.argv) > 4 else ""

walls = {}
fails = {}
for line in open(log_path, errors="replace"):
    m = re.search(r"\[verify\] (\S+) ok ([0-9.]+) s", line)
    if m:
        walls[m.group(1)] = float(m.group(2))
    m = re.search(r"\[verify\] (\S+) failed: (.*)", line)
    if m:
        fails[m.group(1)] = m.group(2).strip()

result = {}
for d in sorted(glob.glob(f"{out_dir}/*/")):
    name = d.rstrip("/").split("/")[-1]
    files = glob.glob(f"{d}/*.parquet")
    rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    result[name] = {
        "rows": rows,
        "rows_clean": rows > 0,
        "wall_sec": walls.get(name),
        "err": fails.get(name),
    }
for name, err in fails.items():
    result.setdefault(name, {"rows": 0, "rows_clean": False,
                             "wall_sec": None, "err": err})

summary = {
    "sf": sf,
    "queries": result,
    "n_queries": len(result),
    "n_rows_clean": sum(1 for v in result.values() if v["rows_clean"]),
    "n_failed": len(fails),
    "total_wall_sec": round(sum(w for w in walls.values()), 1),
}
json.dump(summary, open(json_out, "w"), indent=1, sort_keys=True)
print(f"{summary['n_rows_clean']}/{summary['n_queries']} rows_clean, "
      f"{summary['n_failed']} failed, total {summary['total_wall_sec']} s")
