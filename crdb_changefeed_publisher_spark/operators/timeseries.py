"""Time-series regularization: resample an irregular event stream onto a
fixed grid per key and gap-fill with last-observation-carried-forward
(LOCF) — the KDB/TimescaleDB `time_bucket_gapfill` + `locf` operator pair,
which feature stores and training pipelines run before any windowed model
input is materialized.

Scale shape: observations reduce with ONE partial-agg shuffle on
(key, bucket); the grid is generated per key with `sequence` + `explode`
(rows ∝ key's time span / step — never a global calendar cross join); the
fill is a per-key running `last(ignorenulls)` window — partitioned on the
key, no global window. Everything is codegen'd builtins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_locf(
    events: DataFrame,
    every_seconds: int = 3600,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key fixed-step resample with LOCF gap fill.

    Output: one row per (key, bucket) for every step between the key's
    first and last observation — ``bucket`` (exact integer
    ``floor(epoch_us / step_us)``), ``n_obs`` (observations in the step;
    0 = gap), ``value_sum`` (step sum, carried forward across gaps), and
    ``is_gap``. Leading gaps cannot occur: the grid starts at the key's
    first observed bucket, so the fill is total.
    """
    step_us = int(every_seconds) * 1_000_000
    bucket = F.floor(F.unix_micros(F.col(ts_col)) / step_us).cast("long")
    obs = (
        events.select(F.col(key_col), bucket.alias("bucket"), F.col(value_col))
        .groupBy(key_col, "bucket")
        .agg(
            F.round(F.sum(value_col), 4).alias("_v"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )
    grid = (
        obs.groupBy(key_col)
        .agg(F.min("bucket").alias("_b0"), F.max("bucket").alias("_b1"))
        .select(key_col, F.explode(F.sequence("_b0", "_b1")).alias("bucket"))
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(obs, [key_col, "bucket"], "left")
        .select(
            key_col,
            "bucket",
            F.coalesce(F.col("n_obs"), F.lit(0)).cast("long").alias("n_obs"),
            F.last("_v", ignorenulls=True).over(w).alias("value_sum"),
            (F.coalesce(F.col("n_obs"), F.lit(0)) == 0).alias("is_gap"),
        )
    )
