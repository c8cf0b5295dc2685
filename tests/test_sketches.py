"""Count-Min sketch operator properties: one-sided error, deterministic
for a fixed seed, merge-invariant under repartitioning (linear sketch),
and the freqItems+CMS heavy-hitter composition never misses a true
heavy hitter."""

from __future__ import annotations

import pytest
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


def test_hll_sketches_merge_and_estimate_within_error(spark, sf_dir):
    """HLL family invariants on the real fixture:
    1. per-shard estimates within the lg_k=12 error bound of exact;
    2. the UNION of shard sketches estimates the GLOBAL distinct within
       the same bound — the cross-shard property everything rests on;
    3. union-of-parts == whole-corpus sketch estimate (merge soundness);
    4. report accounting: rows sum, global row present."""
    from crdb_changefeed_publisher_spark.operators.sketches import (
        cross_shard_distinct_report,
        hll_build,
        hll_merge_estimate,
    )
    from crdb_changefeed_publisher_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    keyed = docs.select(
        F.pmod(F.xxhash64("doc_id"), F.lit(4)).cast("int").alias("shard"),
        F.sha2("text", 256).alias("ck"),
    ).cache()
    exact_global = keyed.select("ck").distinct().count()
    exact_per_shard = {
        r.shard: r.n
        for r in keyed.groupBy("shard").agg(F.countDistinct("ck").alias("n")).collect()
    }

    # rel error ~1.04/sqrt(2^12) = 1.6%; allow 5% (3 sigma + small-n noise)
    tol = 0.05
    shard_sketches = hll_build(keyed, "ck", group_cols=["shard"])
    ests = {
        r.shard: r.est
        for r in shard_sketches.select(
            "shard", F.expr("cast(hll_sketch_estimate(sketch) as long)").alias("est")
        ).collect()
    }
    for s, exact in exact_per_shard.items():
        assert abs(ests[s] - exact) <= max(2, tol * exact), (s, ests[s], exact)

    merged = hll_merge_estimate(shard_sketches)
    assert abs(merged - exact_global) <= max(2, tol * exact_global)

    whole = hll_merge_estimate(hll_build(keyed, "ck"))
    # merging shard sketches approximates sketching the whole corpus; the
    # two are NOT bit-identical because DataSketches' streaming (HIP)
    # estimator is lost on union and the composite estimator takes over
    # (measured: 499 vs 504 on 490 exact) — both must sit inside the
    # error bound of the exact answer
    assert abs(whole - exact_global) <= max(2, tol * exact_global)
    assert abs(merged - whole) <= max(2, tol * exact_global)

    report = cross_shard_distinct_report(docs, n_shards=4).collect()
    by_shard = {r.shard: r for r in report}
    assert set(by_shard) == {-1, 0, 1, 2, 3}
    assert by_shard[-1].n_rows == docs.count()
    assert abs(by_shard[-1].est_distinct - exact_global) <= max(2, tol * exact_global)
    # duplicate pressure: sum of per-shard distincts >= global distinct
    assert sum(by_shard[s].est_distinct for s in (0, 1, 2, 3)) >= by_shard[-1].est_distinct


def test_hll_shard_overlap_matrix_inclusion_exclusion(spark, sf_dir):
    """Overlap matrix vs exact pairwise intersections: with a corpus where
    every shard shares a known block of contents, the inclusion-exclusion
    estimate must land within the HLL error bound of the exact overlap,
    and disjoint pairs must clamp to ~0."""
    from crdb_changefeed_publisher_spark.operators.sketches import (
        hll_shard_overlap_matrix,
    )
    from crdb_changefeed_publisher_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # inject overlap: duplicate the first 100 docs' TEXTS under ids that
    # hash into other shards
    dups = docs.orderBy("doc_id").limit(100).select(
        (F.col("doc_id") + 7_000_001).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(dups).cache()

    out = {(r.shard_a, r.shard_b): r for r in hll_shard_overlap_matrix(corpus).collect()}
    assert len(out) == 6  # C(4,2)

    keyed = corpus.select(
        F.pmod(F.xxhash64("doc_id"), F.lit(4)).cast("int").alias("shard"),
        F.sha2("text", 256).alias("ck"),
    ).cache()
    import itertools

    shard_sets = {
        s: {r.ck for r in keyed.filter(F.col("shard") == s).select("ck").distinct().collect()}
        for s in range(4)
    }
    for sa, sb in itertools.combinations(range(4), 2):
        exact = len(shard_sets[sa] & shard_sets[sb])
        est = out[(sa, sb)].est_overlap
        # inclusion-exclusion compounds three ~1.6% estimates; allow
        # 3-sigma-ish of the UNION size plus a small absolute floor
        tol = max(10, 0.10 * len(shard_sets[sa] | shard_sets[sb]))
        assert abs(est - exact) <= tol, (sa, sb, est, exact)


def test_kmv_sketch_properties(spark, sf_dir):
    """KMV family invariants:
    1. exhaustive sketches (distinct < k) give EXACT counts;
    2. estimates on a big distinct set sit within 5x the theoretical
       relative std error (1/sqrt(k-2)) — deterministic, so this is a
       fixed-fact check, not a flaky statistical one;
    3. layout invariance: repartitioning never changes the sketch;
    4. union closure: bottom-k of two merged sketches == the sketch of
       the concatenated data, bit-for-bit (the property that makes KMV
       sketch tables composable artifacts)."""
    from crdb_changefeed_publisher_spark.operators.sketches import (
        kmv_estimate,
        kmv_sketch,
        kmv_union,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_distinct = docs.select("text").distinct().count()

    # 1: k above the distinct count -> the sketch IS the set
    big_k = 2048
    exact_est = (
        kmv_sketch(docs.limit(300), "text", k=big_k)
        .select(kmv_estimate("ks", big_k).alias("e"))
        .collect()[0]
        .e
    )
    assert exact_est == docs.limit(300).select("text").distinct().count()

    # 2: estimation mode on a wide synthetic set
    wide = spark.range(30000).select(F.concat(F.lit("v-"), F.col("id")).alias("text"))
    for k in (64, 256):
        est = (
            kmv_sketch(wide, "text", k=k)
            .select(kmv_estimate("ks", k).alias("e"))
            .collect()[0]
            .e
        )
        assert abs(est - 30000) <= 5 * (1.0 / (k - 2) ** 0.5) * 30000, (k, est)

    # 3: layout invariance
    a = kmv_sketch(docs, "text", k=64).collect()[0].ks
    b = kmv_sketch(docs.repartition(13), "text", k=64).collect()[0].ks
    assert a == b

    # 4: union closure (split corpus by id parity, merge the two sketches)
    left = docs.filter(F.col("doc_id") % 2 == 0)
    right = docs.filter(F.col("doc_id") % 2 == 1)
    sk_l = kmv_sketch(left, "text", k=64).select(F.col("ks").alias("ks_l"))
    sk_r = kmv_sketch(right, "text", k=64).select(F.col("ks").alias("ks_r"))
    merged = sk_l.crossJoin(sk_r).select(kmv_union(F.col("ks_l"), F.col("ks_r"), 64).alias("ks"))
    whole = kmv_sketch(docs, "text", k=64)
    assert merged.collect()[0].ks == whole.collect()[0].ks
    # and the merged estimate is the whole-corpus estimate
    est_merged = merged.select(kmv_estimate("ks", 64).alias("e")).collect()[0].e
    est_whole = whole.select(kmv_estimate("ks", 64).alias("e")).collect()[0].e
    assert est_merged == est_whole
    assert n_distinct > 0  # fixture sanity


def test_kmv_intersection_estimate(spark, sf_dir):
    """Theta-style intersections from KMV sketches:
    1. EXACT when both sketches are exhaustive (k above both set sizes);
    2. estimation mode lands within a loose multiple of the theoretical
       error on a large known overlap;
    3. disjoint sets estimate ~0."""
    from crdb_changefeed_publisher_spark.operators.sketches import (
        kmv_intersection_estimate,
        kmv_sketch,
    )

    def pair_est(df_a, df_b, k):
        sk_a = kmv_sketch(df_a, "text", k=k).select(F.col("ks").alias("ks_a"))
        sk_b = kmv_sketch(df_b, "text", k=k).select(F.col("ks").alias("ks_b"))
        return (
            sk_a.crossJoin(sk_b)
            .select(kmv_intersection_estimate("ks_a", "ks_b", k).alias("e"))
            .collect()[0]
            .e
        )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").cache()

    # 1: exhaustive -> exact intersection of the DISTINCT text sets
    a = docs.filter(F.col("doc_id") % 3 != 0)
    b = docs.filter(F.col("doc_id") % 3 != 1)
    exact = a.select("text").intersect(b.select("text")).count()
    # k=2048 is the enforced int64 ceiling and exceeds the fixture's 500
    # distinct texts at every SF, so both sketches are exhaustive
    assert pair_est(a, b, k=2048) == exact
    with pytest.raises(ValueError, match="KMV k=4096"):
        pair_est(a, b, k=4096)

    # 2: estimation mode — two synthetic sets sharing exactly 10000 values
    base = spark.range(30000).select(F.concat(F.lit("s-"), F.col("id")).alias("text"))
    sa = base.filter(F.col("text") >= "s-0")  # all 30000
    sb = spark.range(20000, 50000).select(F.concat(F.lit("s-"), F.col("id")).alias("text"))
    est = pair_est(sa, sb, k=256)
    assert abs(est - 10000) <= 0.5 * 10000, est  # theta intersections are noisier

    # 3: disjoint
    sc = spark.range(90000, 120000).select(F.concat(F.lit("s-"), F.col("id")).alias("text"))
    assert pair_est(sa, sc, k=256) <= 300


def test_kmv_shard_overlap_matrix_exact_when_exhaustive(spark, sf_dir):
    """With k above every shard's distinct count the KMV sketches are the
    distinct sets themselves, so the theta intersection must equal the
    EXACT pairwise intersections of the injected cross-shard duplicates —
    no tolerance at all (the property HLL can never offer). k=2048 is
    the estimator's int64 ceiling ((k-1)*2^52 < 2^63) and exceeds every
    shard's distinct count at all three fixture SFs."""
    import itertools

    from crdb_changefeed_publisher_spark.operators.sketches import (
        kmv_shard_overlap_matrix,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 7000001).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(dups).cache()

    out = {
        (r.shard_a, r.shard_b): r
        for r in kmv_shard_overlap_matrix(corpus, k=2048).collect()
    }
    assert len(out) == 6

    keyed = corpus.select(
        F.pmod(F.col("doc_id"), F.lit(4)).cast("int").alias("shard"), "text"
    ).cache()
    shard_sets = {
        s: {r.text for r in keyed.filter(F.col("shard") == s).select("text").distinct().collect()}
        for s in range(4)
    }
    for sa, sb in itertools.combinations(range(4), 2):
        r = out[(sa, sb)]
        assert r.est_a == len(shard_sets[sa]), (sa, r.est_a)
        assert r.est_b == len(shard_sets[sb]), (sb, r.est_b)
        assert r.est_overlap == len(shard_sets[sa] & shard_sets[sb]), (sa, sb)
    # doc_id % 10 == 0 implies an EVEN doc_id, so copies flow only
    # shard 0 -> 1 and shard 2 -> 3: exactly those pairs overlap
    assert sum(1 for p, r in out.items() if r.est_overlap > 0) >= 2
    assert out[(0, 1)].est_overlap > 0 and out[(2, 3)].est_overlap > 0


def test_kmv_shard_distinct_global_dedups_cross_shard(spark, sf_dir):
    """The global (shard = -1) row merges shard sketches with
    array_distinct-before-truncate semantics (kmv_union's array_union):
    inject cross-shard duplicate CONTENTS (same text, ids landing in every
    shard) and require the global estimate to equal the exact distinct
    count — exhaustive sketches make this a zero-tolerance check. Without
    the dedup, a hash retained by several shards occupies several merged
    slots and the global row overcounts (ADVICE r6)."""
    from crdb_changefeed_publisher_spark.operators.sketches import (
        kmv_shard_distinct_report,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # replicate every 10th doc into ALL FOUR doc_id%4 shards (offsets
    # 8M+1..8M+4 cover each residue) — heavy cross-shard duplication
    dups = [
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") * 4 + 8_000_000 + r).alias("doc_id"), "text"
        )
        for r in range(4)
    ]
    corpus = docs
    for d in dups:
        corpus = corpus.unionByName(d)
    corpus = corpus.cache()

    exact_global = corpus.select("text").distinct().count()
    out = {r.shard: r for r in kmv_shard_distinct_report(corpus, k=2048).collect()}
    assert out[-1].est_distinct == exact_global
    assert out[-1].n_rows == corpus.count()
    # per-shard rows stay exact too (exhaustive sketches)
    keyed = corpus.select(
        F.pmod(F.col("doc_id"), F.lit(4)).cast("int").alias("shard"), "text"
    )
    for s in range(4):
        exact_s = keyed.filter(F.col("shard") == s).select("text").distinct().count()
        assert out[s].est_distinct == exact_s, s


# --- deterministic mergeable quantile sketch ---------------------------------


def test_quantile_sketch_merge_is_exact(spark, sf_dir):
    """Union closure: sketching disjoint shards and merging equals
    sketching the whole table directly — bit-for-bit, the same closure
    property as kmv_union (any global bottom-k element is in its own
    shard's bottom-k)."""
    from crdb_changefeed_publisher_spark.operators import sketches

    orders = load_table(spark, sf_dir, "orders")
    whole = sketches.quantile_sketch(
        orders, "o_totalprice", "o_orderkey", ["o_orderpriority"], k=64
    )
    sharded = orders.withColumn("_sh", F.pmod("o_orderkey", F.lit(3)))
    parts = sketches.quantile_sketch(
        sharded, "o_totalprice", "o_orderkey", ["o_orderpriority", "_sh"], k=64
    )
    merged = sketches.quantile_sketch_union(parts, ["o_orderpriority"], k=64)

    a = {r.o_orderpriority: (r.n_rows, [tuple(p) for p in r.sketch]) for r in whole.collect()}
    b = {r.o_orderpriority: (r.n_rows, [tuple(p) for p in r.sketch]) for r in merged.collect()}
    assert a == b

    # overlapping shards (the r6 KMV lesson): shared rows must not
    # double-count — distinct-before-truncate keeps the union exact
    dup_parts = parts.unionByName(parts)
    remerged = sketches.quantile_sketch_union(dup_parts, ["o_orderpriority"], k=64)
    c = {r.o_orderpriority: [tuple(p) for p in r.sketch] for r in remerged.collect()}
    assert c == {g: sk for g, (_, sk) in a.items()}


def test_quantile_sketch_estimates_track_exact_percentiles(spark, sf_dir):
    """Accuracy: the k=512 sample median must land within the exact
    p40-p60 band per group (rank error ~1/sqrt(k) ~ 4.4%), and with
    k >= group size the sketch IS the group, so the type-7-floor estimate
    equals the exact type-7-floor percentile."""
    from crdb_changefeed_publisher_spark.operators import sketches

    orders = load_table(spark, sf_dir, "orders")
    sk = sketches.quantile_sketch(
        orders, "o_totalprice", "o_orderkey", ["o_orderpriority"], k=512
    )
    est = sketches.quantile_sketch_estimate(sk, {"p50": 5000})
    bands = orders.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.4)).alias("lo"),
        F.percentile("o_totalprice", F.lit(0.6)).alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    joined = est.join(bands, "o_orderpriority").collect()
    assert joined
    for r in joined:
        assert r.lo <= r.p50 <= r.hi, (r.o_orderpriority, r.lo, r.p50, r.hi)

    # exhaustive k: estimate == exact type-7-floor selection
    big = sketches.quantile_sketch(
        orders, "o_totalprice", "o_orderkey", ["o_orderpriority"], k=sketches.QSK_MAX_K
    )
    exact_est = {
        r.o_orderpriority: r.p50
        for r in sketches.quantile_sketch_estimate(big, {"p50": 5000}).collect()
    }
    import pandas as pd  # noqa: F401

    pdf = orders.select("o_orderpriority", "o_totalprice").toPandas()
    for g, grp in pdf.groupby("o_orderpriority"):
        vals = sorted(grp["o_totalprice"].tolist())
        idx = (5000 * (len(vals) - 1)) // 10000
        assert exact_est[g] == vals[idx]


def test_quantile_sketch_k_validation():
    from crdb_changefeed_publisher_spark.operators import sketches

    with pytest.raises(ValueError):
        sketches.quantile_sketch(None, "v", "id", k=0)
    with pytest.raises(ValueError):
        sketches.quantile_sketch_union(None, k=sketches.QSK_MAX_K + 1)


def test_exact_heavy_hitters_boundary_and_skew(spark):
    """Two-pass exact heavy hitters: a planted distribution with one key
    EXACTLY on the integer threshold (the strict inequality must exclude
    it), one above, a null (excluded by contract), and a distinct tail
    whose false-positive candidates must die in the exact recount."""
    from crdb_changefeed_publisher_spark.operators.sketches import exact_heavy_hitters

    # n = 100 non-null rows; threshold 1/5: qualify iff cnt * 5 > 100
    rows = (
        [("a",)] * 30            # 30*5=150 > 100 -> in
        + [("b",)] * 20          # 20*5=100 -> NOT > 100 -> boundary-out
        + [(f"t{i}",) for i in range(50)]  # uniform tail, all out
        + [(None,)] * 7          # nulls excluded from n AND output
    )
    df = spark.createDataFrame(rows, "k string").repartition(8)
    got = {r.k: (r.cnt, r.share) for r in
           exact_heavy_hitters(df, "k", num=1, den=5).collect()}
    assert got == {"a": (30, 0.3)}

    # superset guarantee at a finer threshold: everything above 1/100
    got2 = {r.k: r.cnt for r in
            exact_heavy_hitters(df, "k", num=1, den=100).collect()}
    assert got2 == {"a": 30, "b": 20}  # tail keys cnt*100 = 100, not > 100

    with pytest.raises(ValueError):
        exact_heavy_hitters(df, "k", num=1, den=50_000_000)
