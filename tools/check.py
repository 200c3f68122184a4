#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify.scala's
parquet dumps against the DuckDB oracle SQL (oracle_sql.json).

Usage: python3 tools/check.py [sf_dir] [out_dir]
"""
import duckdb, json, sys, glob

import numpy as np
import pyarrow.parquet as pq

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    # driver layout: single parquet file; scaled layouts (MakeScaled,
    # Spark writes) are directories of part files — glob those
    import os
    p = f"{sf_dir}/{t}.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        print(f"FAIL {name}: missing spark output"); fail += 1; continue
    try:
        spark_df = pq.read_table(files).to_pandas()
    except Exception as e:
        print(f"FAIL {name}: cannot read spark output: {e}"); fail += 1; continue
    try:
        duck_df = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {str(e)[:200]}"); fail += 1; continue

    s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
    if s_cols != d_cols:
        print(f"FAIL {name}: columns differ spark={s_cols} duck={d_cols}"); fail += 1; continue
    dtype_mismatch = [
        f"{c}: spark={spark_df[c].dtype} duck={duck_df[c].dtype}"
        for c in s_cols if spark_df[c].dtype != duck_df[c].dtype]
    if dtype_mismatch:
        print(f"FAIL {name}: dtype mismatch ({'; '.join(dtype_mismatch)})"); fail += 1; continue
    s = spark_df[s_cols].sort_values(s_cols).reset_index(drop=True)
    d = duck_df[d_cols].sort_values(d_cols).reset_index(drop=True)
    if len(s) != len(d):
        print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}"); fail += 1; continue
    bad = []
    for c in s_cols:
        sv, dv = s[c].to_numpy(), d[c].to_numpy()
        if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(dv.dtype, np.floating):
            svf, dvf = sv.astype(float), dv.astype(float)
            neq = ~((svf == dvf) | (np.isnan(svf) & np.isnan(dvf)))
            if neq.any():
                i = int(np.argmax(neq))
                bad.append(f"{c}: {neq.sum()} diffs, e.g. row {i}: {svf[i]!r} vs {dvf[i]!r} "
                           f"(maxabs {np.nanmax(np.abs(svf - dvf)):.3e})")
        else:
            neq = sv.astype(str) != dv.astype(str)
            if neq.any():
                i = int(np.argmax(neq))
                bad.append(f"{c}: {neq.sum()} diffs, e.g. row {i}: {sv[i]!r} vs {dv[i]!r}")
    if bad:
        print(f"FAIL {name}: " + "; ".join(bad)); fail += 1
    else:
        print(f"ok   {name} ({len(s)} rows)"); ok += 1

# queries without oracle: report row counts only
import os
for p in sorted(glob.glob(f"{out_dir}/*/")):
    name = p.rstrip("/").split("/")[-1]
    if name not in oracle:
        files = glob.glob(f"{p}/*.parquet")
        n = sum(pq.ParquetFile(f).metadata.num_rows for f in files) if files else 0
        print(f"rows-only {name}: {n} rows")

print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
