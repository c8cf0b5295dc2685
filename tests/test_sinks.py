"""Batch sink coverage: partitioned parquet writes with partition pruning on
read-back — the analytics-output path of the engine (the reference's only
sink is the message queue; SURVEY §2.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crdb_changefeed_publisher_spark.tables import load_table


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    out = str(tmp_path / "docs_by_lang")
    docs = load_table(spark, sf_dir, "documents")
    docs.write.partitionBy("lang").mode("overwrite").parquet(out)

    back = spark.read.parquet(out)
    assert back.count() == docs.count()

    pruned = back.filter(F.col("lang") == "en")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition filter must prune at the scan, not post-filter
    assert "PartitionFilters: [isnotnull(lang" in plan
    assert pruned.count() == docs.filter(F.col("lang") == "en").count()


def test_csv_json_roundtrip(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    csv_dir, json_dir = str(tmp_path / "csv"), str(tmp_path / "json")
    nation.write.option("header", True).mode("overwrite").csv(csv_dir)
    nation.write.mode("overwrite").json(json_dir)

    csv_back = spark.read.option("header", True).option("inferSchema", True).csv(csv_dir)
    json_back = spark.read.json(json_dir)
    n = nation.count()
    assert csv_back.count() == n
    assert json_back.count() == n
    assert {r.n_name for r in json_back.collect()} == {r.n_name for r in nation.collect()}
