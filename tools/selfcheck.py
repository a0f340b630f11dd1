#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate (NOT part of the library).

Usage: python3 tools/selfcheck.py [sfDir] [outDir]
  1. assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran
  2. registers the sfDir parquet tables as DuckDB views
  3. runs each oracle_sql.json entry, canonicalizes both sides
     (columns sorted by name, rows sorted, doubles rounded), compares.
"""
import sys, os, json, glob, math
import duckdb
import pyarrow.parquet as pq

ROUND = 6

def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v): v = "NaN"
                else: v = round(v, ROUND)
                if v == 0: v = 0.0
            if isinstance(v, list):
                v = tuple(round(x, ROUND) if isinstance(x, float) else x for x in v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [c for _, c in sorted(enumerate(colnames), key=lambda p: p[1])], out

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for p in glob.glob(f"{sf}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    results = {}
    spark_dirs = [d for d in os.listdir(out) if os.path.isdir(os.path.join(out, d))]
    # a query that FAILED in Verify leaves no output dir — surface it instead
    # of silently shrinking the denominator
    for name in oracles:
        if name not in spark_dirs:
            results[name] = "NO_SPARK_OUTPUT (query failed in Verify?)"
    for name in sorted(spark_dirs):
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            results[name] = "NO_SPARK_OUTPUT"; continue
        t = pq.read_table(files[0])
        scols = t.column_names
        srows = [tuple(r[c] for c in scols) for r in t.to_pylist()]
        srows = [tuple(r) for r in srows]
        if name not in oracles:
            results[name] = f"ROWS_ONLY({len(srows)})"; continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            results[name] = f"ORACLE_ERROR: {e}"; continue
        sc, sr = canon(srows, scols)
        oc, orr = canon(orows, ocols)
        if sc != oc:
            results[name] = f"SCHEMA_MISMATCH spark={sc} oracle={oc}"
        elif len(sr) != len(orr):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(sr)} oracle={len(orr)}"
        elif sr != orr:
            diffs = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
            results[name] = f"VALUE_MISMATCH first_diffs={diffs}"
        else:
            results[name] = f"OK({len(sr)})"
    npass = sum(1 for v in results.values() if v.startswith("OK") or v.startswith("ROWS_ONLY"))
    for k, v in sorted(results.items()):
        print(f"{'PASS' if v.startswith('OK') or v.startswith('ROWS_ONLY') else 'FAIL'} {k}: {v}")
    print(f"\n{npass}/{len(results)} pass")
    sys.exit(0 if npass == len(results) else 1)

if __name__ == "__main__":
    main()
