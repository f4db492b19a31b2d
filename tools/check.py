#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet dumps
against the DuckDB oracle SQL and compare (column-sorted, row-sorted, hashed).

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import sys, json, glob, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize ints/floats: floats → repr with 9 sig digits, ints as int
    def cell(v):
        if v is None or v != v:
            return "NULL"
        if isinstance(v, float):
            return f"{v:.9g}"
        return str(v)
    rows = ["\x1f".join(cell(v) for v in row) for row in df.itertuples(index=False)]
    rows.sort()
    return hashlib.md5("\x1e".join(rows).encode()).hexdigest()

def main(sf_dir, out_dir):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    results = {}
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "MISSING_SPARK_OUTPUT"
            continue
        try:
            spark_df = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            duck_df = con.sql(sql).df()
        except Exception as e:
            results[name] = f"ERROR: {e}"
            continue
        if sorted(spark_df.columns) != sorted(duck_df.columns):
            results[name] = (f"SCHEMA_MISMATCH spark={sorted(spark_df.columns)} "
                             f"duck={sorted(duck_df.columns)}")
            continue
        if len(spark_df) != len(duck_df):
            results[name] = f"ROWCOUNT spark={len(spark_df)} duck={len(duck_df)}"
            continue
        h1, h2 = canon(spark_df), canon(duck_df)
        results[name] = "OK" if h1 == h2 else f"HASH_MISMATCH rows={len(spark_df)}"
    npass = sum(1 for v in results.values() if v == "OK")
    for name, v in sorted(results.items()):
        print(f"{'PASS' if v == 'OK' else 'FAIL':4s} {name}: {v}")
    print(f"\n{npass}/{len(results)} queries match")
    return 0 if npass == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
