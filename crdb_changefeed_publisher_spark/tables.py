"""Fixture table loading.

The driver materializes TPC-H-ish parquet under /root/testdata/sf*/ (see
TESTDATA.md). Loading goes through ``spark.read.parquet`` so Catalyst gets
full predicate pushdown + column pruning into the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


# name -> saved-table identifier. When set (tools/bucket_bench.py, scale
# tests), load_table serves the bucketed catalog table instead of the plain
# parquet path, so the SAME registered query plans run against bucketed
# storage — co-located, exchange-free fact-fact joins — without forking the
# query definitions.
_BUCKETED_OVERRIDES: dict[str, str] = {}


def set_bucketed_overrides(mapping: dict[str, str] | None) -> None:
    _BUCKETED_OVERRIDES.clear()
    if mapping:
        _BUCKETED_OVERRIDES.update(mapping)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name in _BUCKETED_OVERRIDES:
        return spark.table(_BUCKETED_OVERRIDES[name])
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # Normalize ts to a session-tz (UTC) TIMESTAMP no matter how the
        # fixture encodes it. Generations have varied: TIMESTAMP(NANOS)
        # (read as raw int64 via nanosAsLong, see session.py) and plain
        # timestamp[us] without tz (read as TIMESTAMP_NTZ). Downstream
        # epoch arithmetic (`cast("double")`) is only legal on TIMESTAMP,
        # and the DuckDB oracle treats the naive value as UTC, so both
        # variants funnel into the same LTZ type here.
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # Floor-division matches DuckDB's ns->us truncation.
            df = df.withColumn(
                "ts", F.timestamp_micros(F.floor(F.col("ts") / F.lit(1000)).cast("long"))
            )
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def ensure_bucketed_tables(spark: SparkSession, sf_dir: str, buckets: int = 8) -> dict[str, str]:
    """Write lineitem/orders as catalog tables bucketed+sorted on the order
    key (idempotent), returning the overrides mapping for
    set_bucketed_overrides. Bucketing is the write-once amortization of the
    fact-fact join shuffle: with both sides bucketed on the join key, the
    registered q3/q5 plans run exchange-free (plan-asserted in
    tests/test_scale_mechanics.py). Bucket count must scale with volume —
    target >= 100 MB per bucket file; 8 beats 32 at sf0.1 (docs/RESULTS.md).

    Table names encode the scale factor: a leftover sf0.01 table must never
    silently serve an sf0.1 run. A fresh session's in-memory catalog does
    not know about a previous run's warehouse directory, so a stale
    location is removed before the (re)write — but ONLY under an in-memory
    catalog, where an on-disk path the catalog doesn't list is by
    definition an orphan. With a persistent metastore (or a warehouse
    shared by concurrent sessions) "not in this session's listTables" does
    not mean unowned, so the path is left alone and DROP TABLE IF EXISTS +
    mode("overwrite") do the replacement through the catalog."""
    import shutil

    sf_tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    existing = {t.name for t in spark.catalog.listTables()}
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").removeprefix("file:")
    in_memory_catalog = (
        spark.conf.get("spark.sql.catalogImplementation", "in-memory") == "in-memory"
    )
    out = {}
    for name, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        table = f"{name}_bkt{buckets}_{sf_tag}"
        out[name] = table
        if table in existing:
            continue
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        loc = os.path.join(warehouse, table)
        if in_memory_catalog and os.path.exists(loc):
            shutil.rmtree(loc)  # orphaned location from a previous session
        load_table(spark, sf_dir, name).write.bucketBy(buckets, key).sortBy(key).mode(
            "overwrite"
        ).saveAsTable(table)
    return out


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each fixture table as a temp view (for the SQL-first plans)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
