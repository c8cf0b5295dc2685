"""Data profiling / quality-check operator semantics on frames with
INJECTED defects (the fixture tables are clean, so the retired-oracle rows
only prove the zero-violation path; these prove the counting)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from crdb_changefeed_publisher_spark.operators.quality import profile_table, quality_checks


def test_quality_checks_count_injected_violations(spark):
    rows = [
        Row(k=1, ref=10, status="ok", amount=5.0),
        Row(k=1, ref=10, status="ok", amount=3.0),      # dup key (1 extra)
        Row(k=2, ref=None, status="bad", amount=-1.0),  # null ref, bad enum, negative
        Row(k=3, ref=99, status="ok", amount=0.0),      # orphan ref
        Row(k=3, ref=10, status="ok", amount=1.0),      # dup key (another extra)
    ]
    df = spark.createDataFrame(rows)
    parent = spark.createDataFrame([Row(pk=10), Row(pk=11)])
    got = {
        r.check: (r.violations, r.total, r.passed)
        for r in quality_checks(
            df,
            unique_cols=["k"],
            not_null_cols=["ref"],
            enum_domains={"status": ["ok"]},
            non_negative_cols=["amount"],
            contained_in={"ref": (parent, "pk")},
        ).collect()
    }
    assert got == {
        "not_null:ref": (1, 5, False),
        "enum:status": (1, 5, False),
        "non_negative:amount": (1, 5, False),
        "unique:k": (2, 5, False),
        # null ref does not match the parent -> counts as an orphan (the
        # not_null check is the one that names the null problem)
        "contained:ref": (2, 5, False),
    }


def test_quality_checks_all_pass_on_clean_frame(spark):
    df = spark.createDataFrame([Row(k=1, amount=1.0), Row(k=2, amount=2.0)])
    got = quality_checks(df, unique_cols=["k"], non_negative_cols=["amount"]).collect()
    assert all(r.passed and r.violations == 0 and r.total == 2 for r in got)


def test_profile_table_long_format_values(spark):
    df = spark.createDataFrame(
        [Row(a=1, b=None), Row(a=2, b=2.5), Row(a=2, b=7.25)],
        "a long, b double",
    )
    got = {
        (r.column_name, r.metric): r.value for r in profile_table(df, ["a", "b"]).collect()
    }
    assert got[("a", "n_rows")] == "3"
    assert got[("a", "n_null")] == "0"
    assert got[("a", "n_distinct")] == "2"
    assert got[("a", "min")] == "1" and got[("a", "max")] == "2"
    assert got[("b", "n_null")] == "1"
    assert got[("b", "n_distinct")] == "2"
    assert got[("b", "min")] == "2.5" and got[("b", "max")] == "7.25"


def test_profile_is_one_aggregation_job(spark, sf_dir):
    from crdb_changefeed_publisher_spark.tables import load_table

    prof = profile_table(load_table(spark, sf_dir, "orders"), ["o_orderkey", "o_totalprice"])
    plan = prof._jdf.queryExecution().executedPlan().toString()
    # one scan of orders feeds the whole profile (no per-column re-scans)
    assert plan.count("FileScan parquet") + plan.count("Scan parquet") <= 2
