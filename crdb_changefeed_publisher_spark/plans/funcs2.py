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


@query(
    "window_rank_family",
    retired=True,  # registry at the 50 cap; oracle-verified in pytest
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           ntile(4)  OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cume,
           nth_value(o_orderkey, 3) OVER (
               PARTITION BY o_orderpriority ORDER BY o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS third_key,
           lag(o_orderkey, 1, -1) OVER w AS prev_key
    FROM orders
    WHERE o_orderkey % 20 = 0
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
    """,
    doc="The remaining ranking-window surface in one pass: ntile, "
    "percent_rank, cume_dist, nth_value with an explicit unbounded frame, "
    "and lag with a default — partitioned by priority, ordered by the "
    "UNIQUE order key (ties would make ntile/nth_value engine-dependent; "
    "rank/dense_rank/row_number live in supplier_acctbal_rank and the "
    "top-k rows). percent_rank/cume_dist are integer-ratio doubles, "
    "rounded on both sides per the cross-engine float convention. One "
    "shuffle on the partition key serves all five functions (a single "
    "Window node); the modulo slice keeps the retired-gate row count "
    "honest without changing the shape.",
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.nth_value("o_orderkey", 3).over(wfull).alias("third_key"),
        F.lag("o_orderkey", 1, -1).over(w).alias("prev_key"),
    )
