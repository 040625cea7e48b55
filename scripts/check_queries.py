"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its
oracle_sql() on DuckDB at sf0.01 (or --sf DIR), sorts columns by name
and rows by value, and compares exactly. Exit 1 on any mismatch.

Usage: python scripts/check_queries.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as E
    from stirling_pdf_spark.session import get_spark

    spark = get_spark("check_queries", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    from stirling_pdf_spark.runtime.staging import release_staged

    qs = E.queries()
    sqls = E.oracle_sql()
    names = args.names or list(qs)
    failed = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf).toPandas()
            release_staged()
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            failed.append(name)
            continue
        if name not in sqls:
            print(f"ok   {name}: rows-only, {len(sdf)} rows "
                  f"({time.time() - t0:.1f}s)")
            if len(sdf) == 0:
                print(f"WARN {name}: 0 rows")
            continue
        try:
            odf = con.execute(sqls[name]).df()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {exc}")
            failed.append(name)
            continue
        if set(sdf.columns) != set(odf.columns):
            print(f"FAIL {name}: columns {sorted(sdf.columns)} vs "
                  f"{sorted(odf.columns)}")
            failed.append(name)
            continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows {len(sdf)} vs {len(odf)}")
            failed.append(name)
            continue
        a, b = normalize(sdf), normalize(odf)
        # dtype report (schema gate is strict-ish in the driver)
        dt_mismatch = [
            f"{c}: {a[c].dtype} vs {b[c].dtype}"
            for c in a.columns if str(a[c].dtype) != str(b[c].dtype)
        ]
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                          check_exact=True)
        except AssertionError as exc:
            print(f"FAIL {name}: values differ: {str(exc)[:500]}")
            failed.append(name)
            continue
        note = f" [dtypes: {'; '.join(dt_mismatch)}]" if dt_mismatch else ""
        print(f"ok   {name}: {len(sdf)} rows ({time.time() - t0:.1f}s){note}")
        if len(sdf) == 0:
            print(f"WARN {name}: 0 rows")
    if failed:
        print(f"\n{len(failed)} FAILED: {failed}")
        return 1
    print(f"\nall {len(names)} queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
