"""Slowly-changing-dimension (Type 2) history build from a CDC change
stream — the classic downstream consumer of the reference's changefeed
(the reference publishes per-key upsert envelopes, README.md:37; a
warehouse apply loop turns that stream into a versioned dimension table
with validity intervals instead of overwriting in place).

Semantics (per key, ordered by version):

* an upsert OPENS a new interval iff its tracked attributes differ from
  the currently-open interval's, or no interval is open (first version
  ever, or the previous event was a delete) — consecutive no-change
  upserts COLLAPSE into the open interval (CDC feeds re-emit unchanged
  rows constantly; a naive one-row-per-version history explodes);
* a delete CLOSES the open interval at its version and emits nothing —
  the key has no current row until a later upsert reopens it;
* `valid_from` = the opening version, `valid_to` = the version of the
  event that closed the interval (next attribute change or delete),
  NULL while still open; `is_current` = the interval is open at end of
  stream.

Plan shape / 100 TB posture: ONE shuffle on the key. Both windows (the
lag pass that finds change points and the lead pass that assigns
`valid_to`) use the same (partitionBy key, orderBy version) spec, and
the change-point filter between them preserves partitioning and order,
so Catalyst plans a single Exchange + Sort feeding Window -> Filter ->
Window — the second window re-sorts nothing. The filter also shrinks
the data before the lead pass to the change-point rows (for a chatty
CDC feed, a small fraction of the change volume). No join, no collect;
state per key during the sort-based window is O(1).

The raw-row lag is sufficient to detect change points (no need to lag
over boundaries only): a non-boundary row by definition carries the
same attributes as the open interval, so comparing against the
immediately preceding row equals comparing against the interval.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    changes: DataFrame,
    key_col: str,
    version_col: str,
    attr_cols: list[str],
    deleted_col: str | None = None,
) -> DataFrame:
    """Build the Type-2 dimension history from a (key, version, attrs...,
    deleted?) change stream. Versions must be unique per key (any total
    order works: HLC timestamps, log offsets, batch ids). Returns one row
    per validity interval: key, attrs, valid_from, valid_to, is_current.
    """
    w = Window.partitionBy(key_col).orderBy(version_col)
    deleted: Column = (
        F.coalesce(F.col(deleted_col), F.lit(False)) if deleted_col else F.lit(False)
    )
    lagged = changes.select(
        key_col,
        version_col,
        *attr_cols,
        deleted.alias("__del"),
        F.lag(deleted).over(w).alias("__pdel"),
        *[F.lag(a).over(w).alias(f"__prev_{a}") for a in attr_cols],
    )
    attrs_changed = reduce(
        Column.__or__,
        [~F.col(a).eqNullSafe(F.col(f"__prev_{a}")) for a in attr_cols],
    )
    # boundary rows: every delete (closes), plus every upsert that opens a
    # new interval (first version, first after a delete, or attr change)
    boundary = (
        F.col("__del")
        | F.col("__pdel").isNull()
        | F.col("__pdel")
        | attrs_changed
    )
    boundaries = lagged.filter(boundary)
    intervals = boundaries.withColumn("valid_to", F.lead(version_col).over(w))
    return intervals.filter(~F.col("__del")).select(
        key_col,
        *attr_cols,
        F.col(version_col).alias("valid_from"),
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )
