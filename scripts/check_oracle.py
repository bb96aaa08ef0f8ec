#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>
Loads each <verifyOutDir>/<name> parquet dir (Spark result), runs
<verifyOutDir>/oracle_sql.json's SQL in DuckDB with views named after the
tables in <sfDir>, sorts columns by name + rows by all columns, and compares
values cell-by-cell (NaN==NaN, 1e-9 rel tolerance report but exact-match flag)."""
import sys, json, glob, math
import duckdb, pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = f.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
# queries_run.json (written by Verify) lists the queries the run SELECTED.
# A selected query with no dump means it crashed — that must fail, not skip.
# Without the manifest (older dump dirs), every oracle query is expected.
try:
    expected = set(json.load(open(f"{outdir}/queries_run.json")))
except FileNotFoundError:
    expected = set(oracle)
fails = []
skipped = 0
for name, sql in sorted(oracle.items()):
    if not glob.glob(f"{outdir}/{name}/*.parquet"):
        if name in expected:
            fails.append(name)
            print(f"[{name}] SPARK RESULT MISSING: selected but no parquet dumped")
        else:
            # explicit subset run: only judge what was selected
            skipped += 1
        continue
    try:
        spark_df = con.execute(
            f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
    except Exception as e:
        fails.append(name); print(f"[{name}] SPARK RESULT MISSING: {e}"); continue
    try:
        duck_df = con.execute(sql).df()
    except Exception as e:
        fails.append(name); print(f"[{name}] ORACLE SQL ERROR: {e}"); continue
    s = spark_df.reindex(sorted(spark_df.columns), axis=1)
    d = duck_df.reindex(sorted(duck_df.columns), axis=1)
    if list(s.columns) != list(d.columns):
        fails.append(name)
        print(f"[{name}] SCHEMA MISMATCH spark={list(s.columns)} duck={list(d.columns)}")
        continue
    if len(s) != len(d):
        fails.append(name)
        print(f"[{name}] ROWCOUNT MISMATCH spark={len(s)} duck={len(d)}")
        continue
    s = s.sort_values(by=list(s.columns), ignore_index=True)
    d = d.sort_values(by=list(d.columns), ignore_index=True)
    bad = 0
    for c in s.columns:
        sv, dv = s[c], d[c]
        if sv.dtype.kind == 'f' or dv.dtype.kind == 'f':
            neq = ~((sv == dv) | (sv.isna() & dv.isna()))
        else:
            neq = ~((sv.astype(object) == dv.astype(object)) | (sv.isna() & dv.isna()))
        n = int(neq.sum())
        if n:
            bad += n
            idx = neq[neq].index[:3]
            print(f"[{name}] col {c}: {n} diffs, e.g. spark={sv[idx].tolist()} duck={dv[idx].tolist()}")
    dtypes_differ = [(c, str(s[c].dtype), str(d[c].dtype)) for c in s.columns
                     if str(s[c].dtype) != str(d[c].dtype)]
    if dtypes_differ:
        print(f"[{name}] DTYPE note: {dtypes_differ}")
    if bad:
        fails.append(name)
    else:
        print(f"[{name}] OK rows={len(s)}" + (" (dtype note above)" if dtypes_differ else ""))
print()
if skipped:
    print(f"(skipped {skipped} queries not present in {outdir})")
print("FAILED:", fails if fails else "none")
sys.exit(1 if fails else 0)
