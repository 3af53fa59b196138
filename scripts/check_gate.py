#!/usr/bin/env python
"""Local mimic of the driver's correctness gate: run every queries()
entry at sf0.01 and compare with oracle_sql() via DuckDB — row count,
sorted column names, order-insensitive value comparison.

Usage: python scripts/check_gate.py [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def stringify(df: pd.DataFrame) -> pd.DataFrame:
    """Mirror the driver's value hash: every cell rendered to str, so an
    int64 56 vs float64 56.0 mismatch (DuckDB HUGEINT sums!) is caught
    locally instead of only in CORRECTNESS_r{N}.json."""
    return df.astype(str)


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("gate-check")
        .config("spark.sql.shuffle.partitions", "16")
        # deliberately NOT pinning spark.sql.session.timeZone: the driver's
        # gate doesn't, so tz-sensitive queries must pass in any zone
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    only = set(sys.argv[1:])
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows, cols={sorted(sdf.columns)} ({dt:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        a, b = canon(sdf), canon(odf)
        if list(a.columns) != list(b.columns):
            print(f"FAIL  {name}: columns {list(a.columns)} != {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL  {name}: rows {len(a)} != {len(b)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(
                a, b, check_dtype=False, check_exact=False, rtol=0, atol=1e-9
            )
        except AssertionError as e:
            print(f"FAIL  {name}: values differ: {str(e).splitlines()[-1]}")
            n_fail += 1
            continue
        sa, sb = stringify(a), stringify(b)
        if not sa.equals(sb):
            bad = [c for c in sa.columns if not sa[c].equals(sb[c])]
            print(
                f"FAIL  {name}: stringified frames differ in {bad} "
                f"(dtype mismatch? spark={[str(a[c].dtype) for c in bad]} "
                f"oracle={[str(b[c].dtype) for c in bad]})"
            )
            n_fail += 1
            continue
        print(f"PASS  {name}: {len(a)} rows ({dt:.1f}s)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
