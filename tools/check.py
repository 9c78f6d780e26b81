#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify output
against the DuckDB oracle and diff values (columns sorted by name, rows
sorted), mirroring TESTDATA.md / BASELINE.md semantics."""
import sys, os, json, glob, math
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v): v = "NaN"
                else: v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return sorted(cols), out

fails = 0
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d): continue
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        print(f"{name}: NO OUTPUT"); fails += 1; continue
    got = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')")
    gcols = [c[0] for c in got.description]; grows = got.fetchall()
    if name not in oracle:
        print(f"{name}: rows-only ({len(grows)} rows)" + (" FAIL(empty)" if not grows else ""))
        if not grows: fails += 1
        continue
    try:
        exp = con.execute(oracle[name])
        ecols = [c[0] for c in exp.description]; erows = exp.fetchall()
    except Exception as e:
        print(f"{name}: ORACLE ERROR {str(e)[:200]}"); fails += 1; continue
    gc, gr = canon(grows, gcols)
    ec, er = canon(erows, ecols)
    if gc != ec:
        print(f"{name}: SCHEMA MISMATCH spark={gc} duck={ec}"); fails += 1; continue
    if len(gr) != len(er):
        print(f"{name}: ROWCOUNT {len(gr)} vs {len(er)}"); fails += 1
        for a in gr[:3]: print("  spark:", a)
        for b in er[:3]: print("  duck :", b)
        continue
    bad = [(a, b) for a, b in zip(gr, er) if a != b]
    if bad:
        print(f"{name}: {len(bad)}/{len(gr)} VALUE DIFFS; first: \n  spark: {bad[0][0]}\n  duck : {bad[0][1]}")
        fails += 1
    else:
        print(f"{name}: OK ({len(gr)} rows)")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
