#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run graft.Verify's
oracle_sql.json through DuckDB on the same parquet tables and diff against
the Spark parquet outputs (columns sorted by name, exact value equality).

Usage: python3 tools/compare_oracle.py [sf_dir] [verify_out_dir]
"""
import sys, json, glob
import duckdb
import numpy as np
import pandas as pd

base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"create view {t} as select * from '{base}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
failures = 0
for name in sorted(oracle):
    try:
        odf = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}"); failures += 1; continue
    files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
    if not files:
        print(f"{name}: SPARK OUTPUT MISSING"); failures += 1; continue
    sdf = pd.concat([pd.read_parquet(f) for f in files])
    odf = odf.reindex(sorted(odf.columns), axis=1).reset_index(drop=True)
    sdf = sdf.reindex(sorted(sdf.columns), axis=1).reset_index(drop=True)
    if list(odf.columns) != list(sdf.columns):
        print(f"{name}: COLUMN MISMATCH oracle={list(odf.columns)} spark={list(sdf.columns)}")
        failures += 1; continue
    if len(odf) != len(sdf):
        print(f"{name}: ROWCOUNT oracle={len(odf)} spark={len(sdf)}")
        failures += 1; continue
    ok = True
    for c in odf.columns:
        # Dtype-kind-strict: the driver's hash is dtype-sensitive at the
        # value-repr level — int64 vs float64 differ (5 vs 5.0: the
        # DuckDB SUM(BIGINT)->HUGEINT->float64 trap), but width and
        # resolution do not (int32==int64, datetime64[us]==datetime64[ns]
        # all passed the r09 driver gate). Mirror that: fail when the
        # numpy dtype KIND differs (i/u, f, M, b, O), tolerate widths.
        okind = odf[c].dtype.kind.replace("u", "i")
        skind = sdf[c].dtype.kind.replace("u", "i")
        if okind != skind:
            print(f"{name}: DTYPE KIND MISMATCH col={c} "
                  f"oracle={odf[c].dtype} spark={sdf[c].dtype}")
            ok = False
        a, b = odf[c].values, sdf[c].values
        try:
            eq = (pd.isna(a) & pd.isna(b)) | (a == b)
        except Exception:
            eq = pd.Series(a).astype(str).values == pd.Series(b).astype(str).values
        if not np.asarray(eq).all():
            bad = np.where(~np.asarray(eq))[0][:3]
            print(f"{name}: VALUE MISMATCH col={c} rows={bad.tolist()} "
                  f"oracle={a[bad][:3]} spark={b[bad][:3]}")
            ok = False
    if ok:
        print(f"{name}: OK ({len(odf)} rows)")
    else:
        failures += 1
print(f"\n{'FAIL' if failures else 'PASS'}: {len(oracle) - failures}/{len(oracle)} oracle queries match")
sys.exit(1 if failures else 0)
