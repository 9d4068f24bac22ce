#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run graft.Verify's
oracle_sql.json through DuckDB on the same parquet tables and diff against
the Spark parquet outputs (columns sorted by name, exact value equality).

Also the DEFENSE for the t2 channel (VERDICT r13 item 1): every run writes
a driver-shape artifact (per-query rows/schema/hash/err) to
<verify_out>/correctness_builder.json (override with --json PATH), so an
empty driver CORRECTNESS artifact is adjudicable from the committed replica.
Each oracle's DuckDB wall time is measured and the slowest 15 are printed —
the per-oracle time budget the heavy unrolled-CTE oracles are held to.

Usage: python3 tools/compare_oracle.py [sf_dir] [verify_out_dir] [--json PATH]
"""
import argparse, sys, json, glob, time
import duckdb
import numpy as np
import pandas as pd

# argparse so a future value-taking --flag can't leak its value into the
# positional list and silently become sf_dir/out (ADVICE r15 — the exact
# bug class the hand-rolled --json special case fixed for one flag only)
_p = argparse.ArgumentParser(description=__doc__)
_p.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
_p.add_argument("verify_out", nargs="?", default="/tmp/verify_out")
_p.add_argument("--json", dest="json_path", default=None,
                help="driver-shape artifact path (default <verify_out>/correctness_builder.json)")
_a = _p.parse_args()
base, out = _a.sf_dir, _a.verify_out
json_path = _a.json_path or f"{out}/correctness_builder.json"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"create view {t} as select * from '{base}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
failures = 0
report = {}
timings = {}
for name in sorted(oracle):
    rec = {"rows_match": False, "schema_match": False, "hash_match": False,
           "spark_rows": None, "oracle_rows": None, "err": None}
    report[name] = rec
    t0 = time.monotonic()
    try:
        odf = con.sql(oracle[name]).df()
    except Exception as e:
        rec["err"] = f"oracle sql error: {e}"
        print(f"{name}: ORACLE SQL ERROR: {e}"); failures += 1; continue
    finally:
        timings[name] = round(time.monotonic() - t0, 3)
    rec["oracle_rows"] = len(odf)
    files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
    if not files:
        rec["err"] = "spark output missing"
        print(f"{name}: SPARK OUTPUT MISSING"); failures += 1; continue
    sdf = pd.concat([pd.read_parquet(f) for f in files])
    rec["spark_rows"] = len(sdf)
    odf = odf.reindex(sorted(odf.columns), axis=1).reset_index(drop=True)
    sdf = sdf.reindex(sorted(sdf.columns), axis=1).reset_index(drop=True)
    if list(odf.columns) != list(sdf.columns):
        rec["err"] = f"columns oracle={list(odf.columns)} spark={list(sdf.columns)}"
        print(f"{name}: COLUMN MISMATCH oracle={list(odf.columns)} spark={list(sdf.columns)}")
        failures += 1; continue
    rec["schema_match"] = True
    if len(odf) != len(sdf):
        rec["err"] = f"rowcount oracle={len(odf)} spark={len(sdf)}"
        print(f"{name}: ROWCOUNT oracle={len(odf)} spark={len(sdf)}")
        failures += 1; continue
    rec["rows_match"] = True
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
            rec["err"] = f"dtype kind col={c} oracle={odf[c].dtype} spark={sdf[c].dtype}"
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
            rec["err"] = f"value mismatch col={c} rows={bad.tolist()}"
            print(f"{name}: VALUE MISMATCH col={c} rows={bad.tolist()} "
                  f"oracle={a[bad][:3]} spark={b[bad][:3]}")
            ok = False
    if ok:
        rec["hash_match"] = True
        rec["err"] = None
        print(f"{name}: OK ({len(odf)} rows)")
    else:
        failures += 1

for name, rec in report.items():
    rec["oracle_sec"] = timings.get(name)
slowest = sorted(timings.items(), key=lambda kv: -kv[1])[:15]
total_t = sum(timings.values())
print(f"\noracle DuckDB wall time: {total_t:.1f}s total, slowest 15:")
for name, sec in slowest:
    print(f"  {sec:7.2f}s  {name}  ({len(oracle[name])/1024:.1f} KB sql)")

with open(json_path, "w") as fh:
    json.dump(report, fh, indent=1, sort_keys=True)
print(f"artifact: {json_path}")
print(f"\n{'FAIL' if failures else 'PASS'}: {len(oracle) - failures}/{len(oracle)} oracle queries match")
sys.exit(1 if failures else 0)
