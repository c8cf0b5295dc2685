"""Mergeable sketch operators (Count-Min) for frequency estimation at scale.

Why a sketch when groupBy-count exists: a CMS is a LINEAR sketch — every
partition builds a small (depth x width) counter grid, grids merge by
element-wise addition (Spark's partial aggregation does this JVM-side),
and the final grid answers point-frequency queries for ANY key after the
fact. At 100 TB that means one pass, no shuffle proportional to key
cardinality, and a kilobytes-sized artifact you can persist and query
later — the standard tool for "how often does X occur" over a corpus too
wide to materialize exact counts for.

Estimates are deterministic for a fixed seed and one-sided:
``true <= estimate <= true + eps * N`` with probability >= confidence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def cms_build(
    df: DataFrame, col: str, eps: float = 0.001, confidence: float = 0.99, seed: int = 1
) -> bytes:
    """One distributed pass -> serialized Count-Min Sketch bytes.

    The aggregation is Spark's built-in `count_min_sketch` (JVM-side,
    partial-agg mergeable); only the final kilobytes-sized grid reaches
    the driver.

    Integral keys only (enforced): `cms_estimate` / `heavy_hitter_
    estimates` hash the probe key driver-side via the JVM sketch's long
    path and render a `long` output schema — a string-keyed sketch would
    build fine here and then mis-hash or fail at estimate time (ADVICE
    r5). Hash string keys to a long (xxhash64) upstream if needed."""
    dt = dict(df.dtypes)[col]
    if dt not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            f"cms_build: column '{col}' has type {dt}; only integral key "
            "columns are supported (hash strings to a long upstream)"
        )
    row = df.agg(
        F.expr(f"count_min_sketch({col}, {eps}d, {confidence}d, {seed})").alias("s")
    ).collect()[0]
    return bytes(row.s)


def cms_estimate(spark: SparkSession, sketch: bytes, keys: list[int]) -> dict[int, int]:
    """Point-frequency estimates for `keys` from a serialized sketch
    (driver-local: the sketch is already tiny)."""
    cms = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(sketch)
    return {int(k): int(cms.estimateCount(k)) for k in keys}


def heavy_hitter_estimates(
    df: DataFrame,
    col: str,
    support: float = 0.01,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 1,
) -> DataFrame:
    """Compose the two sketch passes a real pipeline runs: `freqItems`
    (Karp-Papadimitriou-Shenker heavy-hitter CANDIDATES — may contain
    false positives, never false negatives above the support threshold)
    proposes keys, the CMS estimates their frequencies. Two scans total,
    both sketch-sized shuffles; output (key, est_count) sorted for
    determinism."""
    spark = df.sparkSession
    candidates = sorted(
        df.stat.freqItems([col], support).collect()[0][f"{col}_freqItems"]
    )
    sketch = cms_build(df, col, eps, confidence, seed)
    est = cms_estimate(spark, sketch, candidates)
    return spark.createDataFrame(
        [(int(k), est[k]) for k in candidates], f"{col} long, est_count long"
    )
