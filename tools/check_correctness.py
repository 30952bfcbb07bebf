#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_correctness.py [sfDir] [outDir]

Runs DuckDB over the same sf parquet tables for every oracle_sql.json
entry and compares against the Spark result parquet written by
`graft.Verify` (run that first via sbt). Comparison: row count, column
names (sorted), and exact value equality after sorting columns by name
(rows are compared in the order both sides produced — queries ORDER BY
on both sides).
"""
import sys, os, json, glob
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
results = {}
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        results[name] = {"status": "NO_OUTPUT"}
        continue
    got = duckdb.connect().execute(
        f"SELECT * FROM read_parquet({files!r})").fetchdf()
    if name not in oracle:
        results[name] = {"status": "ROWS_ONLY", "rows": len(got),
                         "ok": len(got) > 0}
        continue
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        results[name] = {"status": "ORACLE_ERROR", "err": str(e)[:200]}
        continue
    entry = {"rows_spark": len(got), "rows_oracle": len(exp)}
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    entry["schema_match"] = gcols == ecols
    entry["rows_match"] = len(got) == len(exp)
    if entry["schema_match"] and entry["rows_match"]:
        g = got[gcols].reset_index(drop=True)
        e = exp[ecols].reset_index(drop=True)
        mismatches = []
        for c in gcols:
            gv, ev = g[c], e[c]
            try:
                same = gv.equals(ev)
                if not same:
                    # tolerate dtype-but-not-value diffs (int32 vs int64);
                    # str conversion also handles array/list cells
                    same = gv.astype(str).equals(ev.astype(str))
            except Exception:
                same = [str(x) for x in gv] == [str(x) for x in ev]
            if not same:
                mismatches.append(c)
        entry["hash_match"] = not mismatches
        if mismatches:
            entry["mismatch_cols"] = mismatches
            c = mismatches[0]
            diff = g[g[c].astype(str) != e[c].astype(str)]
            entry["first_diff"] = {
                "col": c, "n_diff": int(len(diff)),
                "spark": str(g[c][diff.index[:3]].tolist())[:200] if len(diff) else "",
                "oracle": str(e[c][diff.index[:3]].tolist())[:200] if len(diff) else "",
            } if len(diff) else {"col": c, "note": "str-equal but dtype diff"}
    else:
        entry["hash_match"] = False
    entry["status"] = "PASS" if entry.get("hash_match") else "FAIL"
    results[name] = entry

npass = sum(1 for r in results.values() if r.get("status") == "PASS")
nrows = sum(1 for r in results.values()
            if r.get("status") == "ROWS_ONLY" and r.get("ok"))
nfail = sum(1 for r in results.values()
            if r.get("status") not in ("PASS", "ROWS_ONLY")
            or (r.get("status") == "ROWS_ONLY" and not r.get("ok")))
for name, r in results.items():
    flag = "ok " if r.get("status") == "PASS" else (
        "row" if r.get("status") == "ROWS_ONLY" and r.get("ok") else "BAD")
    print(f"[{flag}] {name}: {json.dumps(r, default=str)[:300]}")
print(f"\nPASS={npass} ROWS_ONLY_OK={nrows} FAIL={nfail} total={len(results)}")
sys.exit(1 if nfail else 0)
