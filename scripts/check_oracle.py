#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir> [jsonOut]
Loads each <verifyOutDir>/<name> parquet dir (Spark result), runs
<verifyOutDir>/oracle_sql.json's SQL in DuckDB with views named after the
tables in <sfDir>, sorts columns by name + rows by all columns, and compares
values cell-by-cell (NaN==NaN, exact-match flag).

Emits, in addition to the human-readable per-query log:
  - a machine-readable per-query JSON map (driver CORRECTNESS_rN.json
    format: {name: {rows_match, schema_match, hash_match, spark_rows,
    oracle_rows, err}}) written to [jsonOut] (default:
    <verifyOutDir>_correctness.json) — commit this each round as
    CORRECTNESS_local_rN.json so the correctness signal cannot be lost
    silently again (round 7's driver artifact arrived empty);
  - a final one-line JSON summary on stdout;
  - exit 0 iff every selected query passed AND at least one query ran.
"""
import sys, json, glob
import duckdb, pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
json_out = sys.argv[3] if len(sys.argv) > 3 else outdir.rstrip("/") + "_correctness.json"
con = duckdb.connect()
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = f.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
# The manifest of queries the Verify run SELECTED lives BESIDE the dump dir
# (legacy dumps had it inside). A selected query with no dump crashed —
# that must fail, not skip. Without any manifest, every oracle query is
# expected.
expected = None
for cand in (outdir.rstrip("/") + ".queries_run.json",
             f"{outdir}/queries_run.json"):
    try:
        expected = set(json.load(open(cand)))
        break
    except FileNotFoundError:
        pass
if expected is None:
    expected = set(oracle)

results = {}   # name -> driver-format record
fails = []
skipped = 0
for name, sql in sorted(oracle.items()):
    rec = {"rows_match": False, "schema_match": False, "hash_match": False,
           "spark_rows": None, "oracle_rows": None, "err": None}
    if not glob.glob(f"{outdir}/{name}/*.parquet"):
        if name in expected:
            rec["err"] = "spark result missing: selected but no parquet dumped"
            results[name] = rec
            fails.append(name)
            print(f"[{name}] SPARK RESULT MISSING: selected but no parquet dumped")
        else:
            skipped += 1  # explicit subset run: only judge what was selected
        continue
    try:
        spark_df = con.execute(
            f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
    except Exception as e:
        rec["err"] = f"spark result unreadable: {e}"
        results[name] = rec
        fails.append(name); print(f"[{name}] SPARK RESULT MISSING: {e}"); continue
    try:
        duck_df = con.execute(sql).df()
    except Exception as e:
        rec["err"] = f"oracle sql error: {e}"
        results[name] = rec
        fails.append(name); print(f"[{name}] ORACLE SQL ERROR: {e}"); continue
    rec["spark_rows"] = int(len(spark_df))
    rec["oracle_rows"] = int(len(duck_df))
    s = spark_df.reindex(sorted(spark_df.columns), axis=1)
    d = duck_df.reindex(sorted(duck_df.columns), axis=1)
    if list(s.columns) != list(d.columns):
        rec["err"] = f"schema mismatch spark={list(s.columns)} duck={list(d.columns)}"
        results[name] = rec
        fails.append(name)
        print(f"[{name}] SCHEMA MISMATCH spark={list(s.columns)} duck={list(d.columns)}")
        continue
    rec["schema_match"] = True
    if len(s) != len(d):
        rec["err"] = f"rowcount mismatch spark={len(s)} duck={len(d)}"
        results[name] = rec
        fails.append(name)
        print(f"[{name}] ROWCOUNT MISMATCH spark={len(s)} duck={len(d)}")
        continue
    rec["rows_match"] = True
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
        rec["err"] = f"{bad} cell diffs"
        fails.append(name)
    else:
        rec["hash_match"] = True
        print(f"[{name}] OK rows={len(s)}" + (" (dtype note above)" if dtypes_differ else ""))
    results[name] = rec

with open(json_out, "w") as f:
    json.dump(results, f, indent=0, sort_keys=True)

print()
if skipped:
    print(f"(skipped {skipped} queries not present in {outdir})")
print("FAILED:", fails if fails else "none")
n_pass = sum(1 for r in results.values() if r["hash_match"])
# Zero entries is itself a failure: an "all green" signal with no evidence
# is exactly how round 7's correctness record silently vanished.
summary = {"metric": "oracle_correctness", "n_queries": len(results),
           "n_pass": n_pass, "n_fail": len(fails), "n_skipped": skipped,
           "failed": sorted(fails), "json_out": json_out,
           "ok": (not fails) and len(results) > 0}
print(json.dumps(summary, sort_keys=True))
sys.exit(0 if summary["ok"] else 1)
