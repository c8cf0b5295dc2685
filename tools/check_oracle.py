#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run each registered query
on Spark and its oracle SQL on DuckDB over the same parquet, compare
row-count, column names, and order-insensitive values.

Usage:
    python tools/check_oracle.py [query ...] [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from crdb_changefeed_publisher_spark import plans
from crdb_changefeed_publisher_spark.session import get_spark
from crdb_changefeed_publisher_spark.tables import TABLE_NAMES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW \"{t}\" AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, spark_pd: pd.DataFrame, oracle_pd: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pd) != len(oracle_pd):
        problems.append(f"rowcount spark={len(spark_pd)} oracle={len(oracle_pd)}")
    if sorted(spark_pd.columns) != sorted(oracle_pd.columns):
        problems.append(f"columns spark={sorted(spark_pd.columns)} oracle={sorted(oracle_pd.columns)}")
        return problems
    if problems:
        return problems
    s, o = normalize(spark_pd), normalize(oracle_pd)
    for c in s.columns:
        sc, oc = s[c], o[c]
        if pd.api.types.is_float_dtype(sc):
            neq = ~((sc == oc) | (sc.isna() & oc.isna()))
            if neq.any():
                diff = (sc[neq] - oc[neq]).abs().max()
                problems.append(f"col {c}: {int(neq.sum())} value diffs, max abs {diff}")
        else:
            neq = ~((sc == oc) | (sc.isna() & oc.isna()))
            if neq.any():
                i = neq.idxmax()
                problems.append(
                    f"col {c}: {int(neq.sum())} diffs, first at row {i}: "
                    f"spark={sc[i]!r} oracle={oc[i]!r}"
                )
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: all)")
    ap.add_argument(
        "--sf",
        default="/root/testdata/sf0.01",
        help="fixture dir, or a bare scale factor like '0.1' "
        "(expanded to /root/testdata/sf<sf>)",
    )
    ap.add_argument(
        "--retired",
        action="store_true",
        help="check the retired specs instead of the driver-registered ones "
        "(same compare tests/test_retired_oracle.py runs in pytest)",
    )
    args = ap.parse_args()

    specs = plans.retired_specs() if args.retired else plans.all_specs()
    names = args.names or sorted(specs)
    spark = get_spark("check_oracle")
    if "/" not in args.sf:
        args.sf = f"/root/testdata/sf{args.sf}"
    con = duckdb_conn(args.sf)

    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        spec = specs[name]
        t0 = time.time()
        try:
            spark_pd = spec.fn(spark, args.sf).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"ROWS  {name}: {len(spark_pd)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            oracle_pd = con.execute(spec.oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = compare(name, spark_pd, oracle_pd)
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            # an empty result "verifies" trivially — flag it so thresholded
            # queries tuned past the data distribution get noticed
            note = "  (WARNING: 0 rows — vacuous pass)" if len(spark_pd) == 0 else ""
            print(f"PASS  {name}: {len(spark_pd)} rows [{time.time()-t0:.1f}s]{note}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only of {len(names)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
