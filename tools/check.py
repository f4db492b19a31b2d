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

def canon(df: pd.DataFrame, digits=None) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    # floats: exact repr by default (strictest possible driver formatter) —
    # the Spark and oracle expressions are written to be bit-identical, so
    # exact float equality is the contract, not a precision window.
    def cell(v):
        if v is None or v != v:
            return "NULL"
        if isinstance(v, float):
            return f"{v:.9g}" if digits else repr(v)
        return str(v)
    rows = ["\x1f".join(cell(v) for v in row) for row in df.itertuples(index=False)]
    rows.sort()
    return hashlib.md5("\x1e".join(rows).encode()).hexdigest()


def dtype_class(dt) -> str:
    k = dt.kind  # numpy kind: i/u = int, f = float, O = object, b = bool
    return {"i": "int", "u": "int", "f": "float"}.get(k, "other")

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
        # int-vs-float dtype divergence (e.g. DuckDB HUGEINT/DECIMAL → pandas
        # float64) prints differently under str()-style formatters even when
        # values are equal — treat as failure like the driver does
        dt_bad = [c for c in spark_df.columns
                  if dtype_class(spark_df[c].dtype) != dtype_class(duck_df[c].dtype)]
        if dt_bad:
            results[name] = ("DTYPE_MISMATCH " + ", ".join(
                f"{c}: spark={spark_df[c].dtype} duck={duck_df[c].dtype}"
                for c in dt_bad))
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
