"""Incremental MATERIALIZED-VIEW maintenance under CDC upserts.

The reference's changefeed envelopes are AFTER-only upserts (key + the
row's new state; a delete is `after: null` — README.md:37, main.rs
envelope construction), which is exactly the input shape for classic
incremental view maintenance: to keep a per-group aggregate current you
do not rescan the base table — you look up the OLD rows of just the
changed keys (a probe-sized join), subtract them, and add the new rows.

`incremental_group_totals` maintains per-group (n_rows, total) that way:
  - latest state per changed key (version order, delete-aware);
  - old contributions fetched by an equi-join of base against the changed
    key set (broadcastable — the changed-key frame is batch-sized, the
    base table is only ever probed, never re-aggregated);
  - delta = new contributions - old contributions, one partial-agg
    shuffle sized by (groups touched), folded into the base aggregate
    with a full-outer join (a group can be born or die in one batch).

Handles group MIGRATION (an update that moves a key to another group
subtracts from the old group and adds to the new one) and deletes.
Correctness contract (tested + oracle-verified): the incremental result
row-equals the full recompute over the applied table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_keyed_changes(
    changes: DataFrame,
    key_col: str,
    version_col: str = "version",
) -> DataFrame:
    """Last-writer-wins per key: the single highest-version change row for
    each key (ties impossible in a changefeed; broken by a deterministic
    full-row sort if an upstream replays one)."""
    order = [F.col(version_col).desc()] + [
        F.col(c).desc() for c in changes.columns if c not in (key_col, version_col)
    ]
    w = Window.partitionBy(key_col).orderBy(*order)
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def incremental_group_totals(
    base: DataFrame,
    changes: DataFrame,
    key_col: str,
    group_col: str,
    value_col: str,
    version_col: str = "version",
    deleted_col: str = "deleted",
) -> DataFrame:
    """Per-group (n_rows, total) of base AFTER applying `changes`, computed
    incrementally: base is aggregated once and probed once on the changed
    keys — never re-aggregated. `changes` carries (key, version, group,
    value, deleted); a deleted row contributes nothing new. Groups whose
    post-apply count reaches zero are dropped (they no longer exist in
    the applied table)."""
    latest = latest_keyed_changes(changes, key_col, version_col)
    changed_keys = latest.select(key_col)

    # old contributions: exactly the changed keys' current rows
    old = base.join(F.broadcast(changed_keys), key_col).select(
        F.col(group_col).alias("g"),
        F.lit(-1).cast("long").alias("dn"),
        (-F.col(value_col)).alias("dv"),
    )
    new = latest.filter(~F.col(deleted_col)).select(
        F.col(group_col).alias("g"),
        F.lit(1).cast("long").alias("dn"),
        F.col(value_col).alias("dv"),
    )
    delta = (
        old.unionByName(new)
        .groupBy("g")
        .agg(F.sum("dn").alias("dn"), F.sum("dv").alias("dv"))
    )
    base_agg = base.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        F.sum(value_col).alias("t0"),
    )
    merged = base_agg.join(delta, "g", "full_outer").select(
        F.col("g").alias(group_col),
        (F.coalesce("n0", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n_rows"),
        (F.coalesce("t0", F.lit(0.0)) + F.coalesce("dv", F.lit(0.0))).alias("total"),
    )
    return merged.filter(F.col("n_rows") > 0).select(
        group_col, "n_rows", F.round("total", 2).alias("total")
    )
