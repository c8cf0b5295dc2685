"""Range (interval) joins that scale: time-bucketed equi-join instead of a
per-key inequality join.

The naive plan for "right rows within `gap` before a left row, same key"
is a join on ``key AND r.ts BETWEEN l.ts - gap AND l.ts``: Catalyst executes
the inequality as a post-filter, so every key joins all-pairs first —
O(per-key L x R), quadratic in hot keys, the classic range-join scale trap
(Flink/KDB interval joins and Databricks' range-join optimization all exist
to avoid exactly this).

``range_join_buckets`` makes the join an EQUI-join: bucket both sides by
``floor(epoch_us / gap_us)``; a right row within [l.ts - gap, l.ts] can only
live in the left row's bucket or the one before it, so the left side
explodes into exactly 2 probe rows and joins on (key, bucket), followed by
the exact window filter. Worst-case work is O(per-key-per-bucket L x R) —
bounded by the time density of the data, not its total volume; AQE
skew-splitting applies to the (key, bucket) shuffle like any other hash
join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    gap_seconds: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """All (left, right) pairs with equal `key_col` and
    ``left_ts - gap <= right_ts <= left_ts`` (right at-or-before left,
    within the gap).

    Output: every left column, every right column (caller pre-aliases to
    avoid collisions — only `key_col` may be shared), plus ``gap_us``
    (exact integer microseconds, no float boundary risk).

    Plan shape: hash equi-join on (key, bucket) with the left side exploded
    to 2 probe buckets; both join inputs carry only the bucket key extra.
    No inequality-join fallback, no per-key cartesian.
    """
    gap_us = int(gap_seconds) * 1_000_000
    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))
    lb = left.withColumn("_l_us", l_us).withColumn(
        "_bucket",
        F.explode(
            F.array(
                F.floor(F.col("_l_us") / gap_us) - 1, F.floor(F.col("_l_us") / gap_us)
            )
        ),
    )
    rb = right.withColumn("_r_us", r_us).withColumn(
        "_bucket", F.floor(F.col("_r_us") / gap_us)
    )
    return (
        lb.join(rb, [key_col, "_bucket"])
        .filter(
            (F.col("_r_us") <= F.col("_l_us"))
            & (F.col("_r_us") >= F.col("_l_us") - gap_us)
        )
        .withColumn("gap_us", F.col("_l_us") - F.col("_r_us"))
        .drop("_bucket", "_l_us", "_r_us")
    )
