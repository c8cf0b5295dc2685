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


def weighted_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """EXACT weighted median per group: the smallest value whose cumulative
    weight (in ascending value order) reaches half the group's total — the
    robust center a quality pipeline uses when observations carry
    importance weights (e.g. token counts) and approx_percentile's error
    bound is not acceptable.

    Shape: one shuffle on the group key; the cumulative weight is a
    partition-local window over the group (groups are assumed
    window-partition-sized — for a single 100 TB group use the two-phase
    range construction in functions/ranks.py, same as pack_sequences).
    Deterministic tiebreak: ascending (value, then any stable column) via
    min() over qualifying rows.

    Output: (group, total_weight, weighted_median).
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(value_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy(group_col)
    cum = F.sum(weight_col).over(w)
    total = F.sum(weight_col).over(tot)
    return (
        df.select(
            F.col(group_col),
            F.col(value_col),
            cum.alias("_cum"),
            total.alias("_tot"),
        )
        .filter(F.col("_cum") * 2 >= F.col("_tot"))
        .groupBy(group_col)
        .agg(
            F.min(value_col).alias("weighted_median"),
            F.min("_tot").alias("total_weight"),
        )
        .select(group_col, "total_weight", "weighted_median")
    )


def rolling_zscore(
    events: DataFrame,
    window_rows: int = 20,
    z_threshold: float = 3.0,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Streaming-style anomaly flags: each observation's z-score against
    the ROLLING mean/std of the preceding `window_rows` same-key
    observations (strictly earlier rows only — no self-inclusion, no
    lookahead, so the flag is causally computable on a live stream).

    Rows whose preceding window has < 2 observations or zero variance get
    z = NULL (cold start / constant signal — not enough evidence to call
    an anomaly). Scale shape: one shuffle on the key, partition-local sort,
    both window aggregates (sum, sumsq via one pass) share a single frame —
    no second shuffle, no global window. Population std over the window =
    sqrt(sumsq/n - mean^2), the same expression the oracle writes.

    Output: (event_id, key, z rounded 4, is_anomaly).
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(-window_rows, -1)
    )
    n = F.count(value_col).over(w)
    mean = F.sum(value_col).over(w) / n
    msq = F.sum(F.col(value_col) * F.col(value_col)).over(w) / n
    var = msq - mean * mean
    z = (F.col(value_col) - mean) / F.sqrt(var)
    z_ok = (n >= 2) & (var > 0)
    return events.select(
        F.col(id_col).alias("event_id"),
        F.col(key_col),
        F.when(z_ok, F.round(z, 4)).alias("z"),
        F.when(z_ok, F.abs(z) > z_threshold).otherwise(F.lit(False)).alias("is_anomaly"),
    )


def resample_interpolate(
    events: DataFrame,
    every_seconds: int = 3600,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key fixed-step resample with LINEAR-INTERPOLATION gap fill — the
    companion to `resample_locf` for continuous signals (sensor values,
    prices) where a step function misstates the gap.

    Gap buckets get ``prev + (next - prev) * (bucket - prev_b) / (next_b -
    prev_b)`` between the nearest observed buckets either side; trailing
    gaps (no later observation) fall back to LOCF. Same scale shape as
    resample_locf — one partial-agg shuffle on (key, bucket), sequence+
    explode grid, per-key windows only — plus one extra window direction
    (first/ignorenulls over the following frame) for the forward neighbor;
    both windows share the same (key, bucket) sort so Spark computes them
    in one WindowExec pass per direction, no extra shuffle.

    Numeric contract: the lerp is computed in INTEGER ten-thousandths —
    ``floor((2*(spv*(nb-t) + snv*(t-pb)) + den) / (2*den)) / 1e4`` — not in
    floating point then rounded: a float lerp lands on exact half-ten-
    thousandths constantly (denominators are small integers), and engines
    disagree on which way those round (measured: 171 flips at sf0.01).
    Integer half-up is exact on any engine (same device as the as-of join's
    integer-µs gap arithmetic).

    Magnitude bound: the division itself runs as IEEE double in both
    engines (Spark ``/`` on longs and DuckDB ``/`` both promote), so the
    "exact" claim holds only while ``|2*num + den| < 2^53`` — i.e.
    |scaled value| * gap-length-in-buckets below ~4.5e15, or values under
    ~10^8 across gaps up to ~4.5e3 buckets at the 1e4 scaling. Beyond that
    the two engines still agree with EACH OTHER (same double semantics);
    only the half-up tie behavior can degrade. A true cross-engine integer
    division is not used because Spark's ``div`` truncates toward zero
    while floor semantics are needed for negative lerps.
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
    w_prev = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_bucket = F.when(F.col("_sv").isNotNull(), F.col("bucket"))
    j = (
        grid.join(
            obs.withColumn("_sv", F.round(F.col("_v") * 10000).cast("long")),
            [key_col, "bucket"],
            "left",
        )
        .withColumn("_spv", F.last("_sv", ignorenulls=True).over(w_prev))
        .withColumn("_pb", F.last(obs_bucket, ignorenulls=True).over(w_prev))
        .withColumn("_snv", F.first("_sv", ignorenulls=True).over(w_next))
        .withColumn("_nb", F.first(obs_bucket, ignorenulls=True).over(w_next))
    )
    n_obs = F.coalesce(F.col("n_obs"), F.lit(0))
    # lerp in exact scaled integers: pv*(1-t) + nv*t with t=(b-pb)/(nb-pb)
    # == (spv*(nb-b) + snv*(b-pb)) / (nb-pb), then half-up division
    num = F.col("_spv") * (F.col("_nb") - F.col("bucket")) + F.col("_snv") * (
        F.col("bucket") - F.col("_pb")
    )
    den = F.col("_nb") - F.col("_pb")
    scaled = F.floor((2 * num + den) / (2 * den))
    return j.select(
        key_col,
        "bucket",
        n_obs.cast("long").alias("n_obs"),
        (
            F.when(n_obs > 0, F.col("_sv"))
            .when(F.col("_snv").isNull(), F.col("_spv"))
            .otherwise(scaled)
            / 10000.0
        ).alias("value_interp"),
        (n_obs == 0).alias("is_gap"),
    )
