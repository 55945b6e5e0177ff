#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet result and compares it against the
matching SQL in <verifyOutDir>/oracle_sql.json executed by DuckDB over the
parquet tables in <sfDir>. Columns are sorted by name, rows sorted by all
columns, values compared exactly (with a report of float near-misses).
Dev-only tool — the engine itself never depends on DuckDB.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df) == 0:
        return df
    # list/array cells (ANN signatures, hashed-TF vectors) are unhashable
    # and break pandas' lexsort — canonicalize them to tuples, which sort
    # and compare element-wise exactly like the driver's value hashing
    for c in df.columns:
        if df[c].dtype == object and df[c].map(
                lambda x: isinstance(x, (list, tuple)) or
                hasattr(x, "__len__") and not isinstance(x, str)).any():
            df[c] = df[c].map(
                lambda x: tuple(x) if not isinstance(x, (str, bytes))
                and hasattr(x, "__len__") else x)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def cmp_frames(name, spark_df, duck_df):
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return f"SCHEMA cols spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"
    if len(spark_df) != len(duck_df):
        return f"ROWS spark={len(spark_df)} duck={len(duck_df)}"
    a, b = canon(spark_df), canon(duck_df)
    bad = []
    for c in a.columns:
        av, bv = a[c], b[c]
        for i, (x, y) in enumerate(zip(av, bv)):
            eq = (x == y) or (x is None and y is None)
            try:
                if isinstance(x, float) or isinstance(y, float):
                    eq = (x == y) or (math.isnan(x) and math.isnan(y)) or \
                        (pd.isna(x) and pd.isna(y))
                elif pd.isna(x) and pd.isna(y):
                    eq = True
            except (TypeError, ValueError):
                pass
            if not eq:
                bad.append((c, i, x, y))
                if len(bad) >= 3:
                    return f"VALUES {bad}"
    return f"VALUES {bad}" if bad else None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            continue
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable {e}")
            continue
        err = cmp_frames(name, spark_df, duck_df)
        if err:
            print(f"FAIL {name}: {err}")
        else:
            print(f"OK   {name} ({len(spark_df)} rows)")
            n_ok += 1
    print(f"== {n_ok}/{len(oracle)} queries match")
    sys.exit(0 if n_ok == len(oracle) else 1)


if __name__ == "__main__":
    main()
