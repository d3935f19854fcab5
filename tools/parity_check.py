"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names and values
(columns sorted by name, rows sorted by all columns — order-insensitive).

Usage: python tools/parity_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype) == "object":
            df[c] = df[c].map(
                lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns),
                          ignore_index=True, na_position="first")


def compare(name: str, spark_df, oracle_df) -> tuple[bool, str]:
    a, b = normalize(spark_df), normalize(oracle_df)
    if len(a) != len(b):
        return False, f"row count {len(a)} vs {len(b)}"
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} vs {list(b.columns)}"
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                      check_exact=True)
        return True, "exact"
    except AssertionError as e:
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                          rtol=1e-9, atol=1e-9)
            return False, "approx-only (values differ at <1e-9 — check "\
                          "rounding strategy)"
        except AssertionError:
            return False, str(e).split("\n")[0][:200]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    from flink_cdc_dsql_master_spark.queries import ORACLE, QUERIES
    from flink_cdc_dsql_master_spark.session import get_spark

    spark = get_spark("parity-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = n_rows_only = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {e}")
            n_fail += 1
            continue
        if name not in ORACLE:
            print(f"rows  {name}: {len(sdf)} rows (rows-only check)")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(ORACLE[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error {e}")
            n_fail += 1
            continue
        ok, msg = compare(name, sdf, odf)
        if ok:
            print(f"PASS  {name}: {len(sdf)} rows {msg}")
            n_pass += 1
        else:
            print(f"FAIL  {name}: {msg}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {n_rows_only} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
