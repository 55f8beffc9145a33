#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: run the oracle SQL (from
oracle_sql.json) in DuckDB over the sfDir parquet tables, load the Spark
result parquet, sort columns by name + rows, and compare values.
Dev-only helper; the shipped library is pure Scala.
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(9)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("float64")  # int32 vs int64 parity
        elif s.dtype == object:
            import datetime
            nn = s.dropna()
            if len(nn) and isinstance(nn.iloc[0], datetime.date):
                df[c] = pd.to_datetime(s, errors="coerce").astype("datetime64[us]")
            else:
                df[c] = s.map(lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                              hasattr(v, "tolist") and not isinstance(v, (str, bytes))
                              else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        na_position="first").reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    import os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_ok = n_bad = 0
    for name in names:
        spark_df = pd.read_parquet(os.path.join(out_dir, name))
        if name not in oracles:
            print(f"  {name}: NO-ORACLE rows={len(spark_df)}")
            continue
        try:
            oracle_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"✗ {name}: ORACLE SQL ERROR: {e}")
            n_bad += 1
            continue
        a, b = canon(spark_df), canon(oracle_df)
        if list(a.columns) != list(b.columns):
            print(f"✗ {name}: COLUMNS spark={list(a.columns)} oracle={list(b.columns)}")
            n_bad += 1
            continue
        if len(a) != len(b):
            print(f"✗ {name}: ROWS spark={len(a)} oracle={len(b)}")
            n_bad += 1
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                          check_exact=False, rtol=1e-9, atol=1e-9)
            print(f"✓ {name} rows={len(a)}")
            n_ok += 1
        except AssertionError as e:
            print(f"✗ {name}: VALUES differ: {str(e).splitlines()[-1]}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad, {len(names)} total")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
