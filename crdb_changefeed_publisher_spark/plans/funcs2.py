"""Third wave of aggregate-function coverage: conditional aggregates over a
null-handling relabel. (The window-function zoo merged into
`supplier_acctbal_rank`; the extended string functions merged into
`string_funcs_part` — registry consolidation, round 3.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crdb_changefeed_publisher_spark.plans.registry import query
from crdb_changefeed_publisher_spark.tables import load_table


@query(
    "conditional_aggs_orders",
    retired=True,  # r8 swap round 4: conditional-agg shape covered by
    # orders_quality_checks + q1_pricing_summary; still pytest-oracle-verified
    oracle="""
    SELECT coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_label,
           count(*)                                      AS n_orders,
           count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
           CAST(bool_or(o_orderpriority = '1-URGENT') AS INT)  AS has_urgent,
           CAST(bool_and(o_totalprice > 0) AS INT)             AS all_positive,
           round(min(CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice END), 2)
               AS min_low_price
    FROM orders GROUP BY 1
    """,
    doc="Conditional aggregates (filtered count, bool_or/bool_and, "
    "conditional min) grouped on a NULL-handling relabel of the status "
    "(nullif + coalesce) — the conditional-agg and null-function scalar "
    "surfaces in one single-pass aggregate.",
)
def conditional_aggs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    label = F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open"))
    return o.groupBy(label.alias("status_label")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.bool_or(F.col("o_orderpriority") == "1-URGENT").cast("int").alias("has_urgent"),
        F.bool_and(F.col("o_totalprice") > 0).cast("int").alias("all_positive"),
        F.round(
            F.min(F.when(F.col("o_orderpriority") == "5-LOW", F.col("o_totalprice"))), 2
        ).alias("min_low_price"),
    )
