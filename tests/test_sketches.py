"""Count-Min sketch operator properties: one-sided error, deterministic
for a fixed seed, merge-invariant under repartitioning (linear sketch),
and the freqItems+CMS heavy-hitter composition never misses a true
heavy hitter."""

from __future__ import annotations

from pyspark.sql import functions as F

from crdb_changefeed_publisher_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    heavy_hitter_estimates,
)
from crdb_changefeed_publisher_spark.tables import load_table


def test_cms_one_sided_error_and_partition_invariance(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem").select("l_suppkey")
    exact = {r.l_suppkey: r.n for r in l.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_total = sum(exact.values())
    eps = 0.001
    sketch = cms_build(l, "l_suppkey", eps=eps)
    keys = sorted(exact)[:50]
    est = cms_estimate(spark, sketch, keys)
    for k in keys:
        assert est[k] >= exact[k]                      # never undercounts
        assert est[k] <= exact[k] + eps * n_total * 3  # generous CMS bound
    # linear sketch: same seed -> identical estimates regardless of layout
    est2 = cms_estimate(spark, cms_build(l.repartition(13), "l_suppkey", eps=eps), keys)
    assert est == est2


def test_heavy_hitter_composition_covers_true_hitters(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem").select("l_suppkey")
    n_total = l.count()
    support = 0.005
    exact = {
        r.l_suppkey: r.n
        for r in l.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    true_hitters = {k for k, n in exact.items() if n > support * n_total}
    out = {r.l_suppkey: r.est_count for r in heavy_hitter_estimates(l, "l_suppkey", support).collect()}
    # freqItems guarantees no false negatives above the support threshold
    assert true_hitters <= set(out)
    for k, e in out.items():
        assert e >= exact.get(k, 0)
