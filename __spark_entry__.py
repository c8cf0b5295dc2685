"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). Queries live in ``crdb_changefeed_publisher_spark.plans``
(one QuerySpec per operator from SURVEY.md §2 + the LLM-pipeline surface);
this module just adapts the registry to the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crdb_changefeed_publisher_spark import plans  # noqa: E402


def _configure(spark: SparkSession) -> SparkSession:
    """Apply session settings the operators rely on (the driver may hand us
    a session built without our factory)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # pragma: no cover - static conf on some builds
        pass
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _configure(spark)
    return plans.get_spec("q1_pricing_summary").fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (see SURVEY.md §2 and plans/)."""

    def wrap(spec):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return spec.fn(_configure(spark), sf_dir)

        run.__doc__ = spec.doc
        return run

    return {name: wrap(spec) for name, spec in plans.all_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted => rows-only check."""
    return {
        name: spec.oracle for name, spec in plans.all_specs().items() if spec.oracle is not None
    }
