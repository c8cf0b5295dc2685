"""Parameterized funnel analysis: N ordered steps, optional per-step time
window (max gap), greedy earliest-qualifying-event semantics.

Contract (matches ClickHouse windowFunnel / product-analytics tools):
a user advances to step i+1 at the EARLIEST event of that type strictly
after their step-i time (and within `max_gap_seconds` of it when set).
Greedy-earliest is deterministic and one-pass per step; for gap-windowed
funnels it is a heuristic — choosing a later step-i event can sometimes
rescue step i+1 — which is the standard trade every funnel engine makes
(documented, not hidden).

Scale shape: each step is one partial-agg min(ts) plus an equi-join on the
user key — no windows, no per-user sorts, no event-sequence explode. Step
frames shrink monotonically, and every join key is the user id, so all N
steps reuse one exchange layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    max_gap_seconds: int | None = None,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """One row per funnel step: (step 1-based, event_type, users)."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    prev: DataFrame | None = None
    counts: list[DataFrame] = []
    for idx, et in enumerate(steps):
        e = events.filter(F.col(type_col) == et)
        if prev is not None:
            e = e.join(prev, key_col).filter(F.col(ts_col) > F.col("_t"))
            if max_gap_seconds is not None:
                e = e.filter(
                    F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("_t"))
                    <= max_gap_seconds * 1_000_000
                )
        cur = e.groupBy(key_col).agg(F.min(ts_col).alias("_t"))
        counts.append(
            cur.agg(F.count(F.lit(1)).alias("users")).select(
                F.lit(idx + 1).alias("step"), F.lit(et).alias("event_type"), "users"
            )
        )
        prev = cur
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out
