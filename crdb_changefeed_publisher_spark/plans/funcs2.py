"""Third wave of scalar/window/aggregate function coverage: the ranking and
frame-function zoo, extended string functions, and conditional aggregates.
Same portability discipline as every plans module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crdb_changefeed_publisher_spark.plans.registry import query
from crdb_changefeed_publisher_spark.tables import load_table


@query(
    "window_function_zoo",
    oracle="""
    SELECT s_suppkey,
           ntile(4)       OVER w                         AS quartile,
           round(percent_rank() OVER w, 6)               AS pct_rank,
           round(cume_dist()    OVER w, 6)               AS cume,
           first_value(s_suppkey) OVER w                 AS richest,
           lag(s_suppkey)  OVER w                        AS prev_supp,
           lead(s_suppkey, 1, -1) OVER w                 AS next_supp
    FROM supplier
    WINDOW w AS (ORDER BY s_acctbal DESC, s_suppkey)
    """,
    doc="Ranking/frame window functions: ntile, percent_rank, cume_dist, "
    "first_value, lag, lead-with-default over one deterministic ordering. "
    "SCALE CONSTRAINT: the unpartitioned window is intentional and "
    "DIMENSION-TABLE ONLY (supplier) — percent_rank/cume_dist/ntile need "
    "the global row count and lag/lead need neighbor rows, so they don't "
    "two-phase like plain ranks do; for fact-sized global ranking use "
    "functions/ranks.py::global_rank (see supplier_acctbal_rank).",
)
def window_function_zoo(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    w = Window.orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
    return s.select(
        "s_suppkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("s_suppkey").over(w).alias("richest"),
        F.lag("s_suppkey").over(w).alias("prev_supp"),
        F.lead("s_suppkey", 1, -1).over(w).alias("next_supp"),
    )


@query(
    "string_funcs_zoo",
    oracle="""
    SELECT p_partkey,
           lpad(p_brand, 12, '*')            AS brand_padded,
           reverse(p_name)                   AS name_reversed,
           left(p_name, 4)                   AS name_left,
           right(p_name, 4)                  AS name_right,
           repeat(p_type, 2)                 AS type_doubled,
           split_part(p_name, ' ', 2)        AS second_word,
           CAST(position(' ' IN p_name) AS INT) AS space_pos
    FROM part WHERE p_partkey % 7 = 0
    """,
    doc="Extended string functions: lpad/reverse/left/right/repeat/"
    "split_part/position.",
)
def string_funcs_zoo(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.filter(F.col("p_partkey") % 7 == 0).select(
        "p_partkey",
        F.lpad("p_brand", 12, "*").alias("brand_padded"),
        F.reverse("p_name").alias("name_reversed"),
        F.substring("p_name", 1, 4).alias("name_left"),
        F.col("p_name").substr(F.length("p_name") - 3, F.lit(4)).alias("name_right"),
        F.repeat("p_type", 2).alias("type_doubled"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("second_word"),
        F.instr("p_name", " ").alias("space_pos"),
    )


@query(
    "conditional_aggs_orders",
    oracle="""
    SELECT o_orderstatus,
           count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
           CAST(bool_or(o_orderpriority = '1-URGENT') AS INT)  AS has_urgent,
           CAST(bool_and(o_totalprice > 0) AS INT)             AS all_positive,
           round(min(CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice END), 2)
               AS min_low_price
    FROM orders GROUP BY o_orderstatus
    """,
    doc="Conditional aggregates: filtered count, bool_or/bool_and, "
    "conditional min.",
)
def conditional_aggs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.bool_or(F.col("o_orderpriority") == "1-URGENT").cast("int").alias("has_urgent"),
        F.bool_and(F.col("o_totalprice") > 0).cast("int").alias("all_positive"),
        F.round(
            F.min(F.when(F.col("o_orderpriority") == "5-LOW", F.col("o_totalprice"))), 2
        ).alias("min_low_price"),
    )
