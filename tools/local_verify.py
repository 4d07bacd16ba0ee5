#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify at a
given SF, execute each oracle SQL in DuckDB over the same parquet tables,
and compare row counts, column names and values, stringified exactly like
the driver (no float epsilon; HUGEINT oracle columns are a hard fail). Usage:
    python3 tools/local_verify.py [sfdir] [outdir] [--skip-spark]
"""
import json, math, subprocess, sys, glob, os

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

if "--skip-spark" not in sys.argv:
    r = subprocess.run(["sbt", "-batch", f"runMain graft.Verify {sfdir} {outdir}"],
                       cwd="/root/repo", capture_output=True, text=True, timeout=1800)
    if r.returncode != 0:
        print(r.stdout[-3000:]); print(r.stderr[-3000:]); sys.exit(1)
    for line in r.stderr.splitlines():
        if "[verify]" in line: print(line)

import duckdb
import pandas as pd
con = duckdb.connect()
for t in TABLES:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok, bad = [], []
for name in sorted(oracle):
    sql = oracle[name]
    spark_dir = f"{outdir}/{name}"
    files = glob.glob(f"{spark_dir}/*.parquet")
    if not files:
        bad.append((name, "no spark output")); continue
    try:
        got = con.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchdf()
        rel = con.sql(sql)
        want = rel.df()
    except Exception as e:
        bad.append((name, f"exec error: {str(e)[:200]}")); continue
    gcols, wcols = sorted(got.columns), sorted(want.columns)
    if gcols != wcols:
        bad.append((name, f"columns differ: spark={gcols} oracle={wcols}")); continue
    if len(got) != len(want):
        bad.append((name, f"rowcount differ: spark={len(got)} oracle={len(want)}")); continue
    huge = [c for c, t in zip(rel.columns, rel.types) if "HUGEINT" in str(t).upper()]
    if huge:
        bad.append((name, f"oracle cols typed HUGEINT (cast them): {huge}")); continue
    got, want = got[gcols].reset_index(drop=True), want[gcols].reset_index(drop=True)
    # driver-faithful compare: plain str() of every cell (no float epsilon —
    # an integer-valued float64 stringifies "10.0" and must NOT match "10"),
    # rows order-insensitive like the driver's sorted hash
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)): return "NULL"
        return str(v).removesuffix(" 00:00:00")
    grows = sorted("|".join(cell(v) for v in r) for r in got.itertuples(index=False, name=None))
    wrows = sorted("|".join(cell(v) for v in r) for r in want.itertuples(index=False, name=None))
    mism = None
    for i, (gr, wr) in enumerate(zip(grows, wrows)):
        if gr != wr:
            mism = f"first differing sorted row {i}: spark={gr!r} oracle={wr!r}"; break
    if mism: bad.append((name, mism))
    else: ok.append((name, len(got)))

no_oracle = [n for n in os.listdir(outdir)
             if os.path.isdir(f"{outdir}/{n}") and n not in oracle]
print(f"\n=== {len(ok)} MATCH, {len(bad)} MISMATCH, {len(no_oracle)} rows-only ===")
for n, c in ok: print(f"  OK   {n} ({c} rows)")
for n in sorted(no_oracle):
    nf = len(glob.glob(f"{outdir}/{n}/*.parquet"))
    print(f"  ROWS {n} ({'has' if nf else 'NO'} output)")
for n, m in bad: print(f"  BAD  {n}: {m}")
sys.exit(1 if bad else 0)
