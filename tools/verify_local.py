#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify first
(dumps each query's result parquet + oracle_sql.json), then this script runs
every oracle SQL in DuckDB over the same sf tables and compares row counts,
schemas (column names), and a canonical value hash (columns sorted by name,
rows sorted, values stringified like the driver does).

Usage: python3 tools/verify_local.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import hashlib

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float):
            return f"{v:.6f}".rstrip("0").rstrip(".")
        # dates read back as datetime64 vs date objects: normalize midnight
        return str(v).removesuffix(" 00:00:00")
    rows = sorted("|".join(cell(v) for v in r) for r in df.itertuples(index=False, name=None))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    bad = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"{name}: MISSING spark output"); bad += 1; continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files])
            ora_df = con.sql(sql).df()
        except Exception as e:
            print(f"{name}: ERROR {e}"); bad += 1; continue
        rows = len(spark_df) == len(ora_df)
        schema = sorted(spark_df.columns) == sorted(ora_df.columns)
        h = canon(spark_df) == canon(ora_df) if rows and schema else False
        ok = rows and schema and h
        bad += 0 if ok else 1
        print(f"{name}: {'OK' if ok else 'FAIL'} rows={len(spark_df)}/{len(ora_df)}"
              + ("" if schema else f" schema {sorted(spark_df.columns)} vs {sorted(ora_df.columns)}")
              + ("" if h or not (rows and schema) else " HASH-MISMATCH"))
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
