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

from pyspark.sql import Column, DataFrame, SparkSession, Window
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


def hll_build(
    df: DataFrame,
    col: str,
    group_cols: list[str] | None = None,
    lg_k: int = 12,
) -> DataFrame:
    """Per-group HyperLogLog sketches (Apache DataSketches HLL_4 via Spark's
    built-in `hll_sketch_agg` — JVM-side, partial-agg mergeable): one
    kilobytes-sized binary per group that answers distinct-count questions
    AFTER the fact and merges with any other sketch of the same lg_k.

    The 100 TB property: a distinct count per shard/day/source costs one
    scan with map-side combine (the shuffle carries sketches, never
    values), and the resulting sketch TABLE is a persistable artifact —
    cross-shard/global distincts then come from `hll_merge_estimate`
    without ever rescanning the data. Standard error ~1.04/sqrt(2^lg_k)
    (~1.6% at the lg_k=12 default)."""
    keys = [F.col(c) for c in (group_cols or [])]
    agg = F.expr(f"hll_sketch_agg({col}, {lg_k})").alias("sketch")
    if keys:
        return df.groupBy(*keys).agg(agg)
    return df.agg(agg)


def hll_merge_estimate(sketches: DataFrame, sketch_col: str = "sketch") -> int:
    """Union all sketch rows (hll_union_agg — also mergeable/partial-agg)
    and return the distinct estimate of the COMBINED underlying sets.
    Input is a sketch table, typically kilobytes — this never touches the
    original data."""
    row = sketches.agg(
        F.expr(f"hll_sketch_estimate(hll_union_agg({sketch_col}, true))").alias("est")
    ).collect()[0]
    return int(row.est)


def cross_shard_distinct_report(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 8,
    lg_k: int = 12,
) -> DataFrame:
    """The operational question HLL exists for at corpus scale: "how much
    cross-shard duplication is there?" without any corpus-wide shuffle.

    Per shard (id hash mod n_shards): row count + an HLL sketch of the
    content hash. The global distinct comes from the UNION of the shard
    sketches — so the output's `global` row is computed from n_shards
    kilobyte sketches, not from the documents. Output: one row per shard
    (shard, n_rows, est_distinct) plus a ('global', total_rows,
    est_distinct_union) row; sum(shard est_distinct) - global est ≈ the
    number of contents present in more than one shard (the incremental-
    dedup pressure between shards).

    Content key: sha2-256 (the repo's content-address primitive) — the
    sketch hashes the 64-hex string; estimates are deterministic for a
    fixed lg_k."""
    keyed = docs.select(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int").alias("shard"),
        F.sha2(F.col(text_col), 256).alias("_ck"),
    )
    per_shard = keyed.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr(f"hll_sketch_agg(_ck, {lg_k})").alias("sketch"),
    )
    per_shard = per_shard.select(
        "shard",
        "n_rows",
        F.expr("hll_sketch_estimate(sketch)").cast("long").alias("est_distinct"),
        "sketch",
    ).cache()
    global_row = per_shard.agg(
        F.lit(-1).cast("int").alias("shard"),
        F.sum("n_rows").alias("n_rows"),
        F.expr("hll_sketch_estimate(hll_union_agg(sketch, true))")
        .cast("long")
        .alias("est_distinct"),
    )
    return (
        per_shard.select("shard", "n_rows", "est_distinct")
        .unionByName(global_row)
        .orderBy("shard")
    )


def hll_shard_overlap_matrix(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 4,
    lg_k: int = 12,
) -> DataFrame:
    """Pairwise cross-shard overlap estimates by inclusion-exclusion over
    the shard sketches: est|A ∩ B| = est|A| + est|B| - est|A ∪ B|, where
    the union estimate comes from merging the two shards' sketches — no
    data beyond the KB sketch table is touched for any pair, so the full
    n^2 shard-overlap matrix costs n^2 sketch merges, not n^2 data joins.

    Output: one row per unordered shard pair (shard_a < shard_b) with the
    three estimates and est_overlap (clamped at 0 — inclusion-exclusion
    on ~1.6%-error estimates can go slightly negative on disjoint sets).
    The tool for 'which shards should an incremental dedup pass compare
    first' at corpus scale."""
    keyed = docs.select(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int").alias("shard"),
        F.sha2(F.col(text_col), 256).alias("_ck"),
    )
    per_shard = keyed.groupBy("shard").agg(
        F.expr(f"hll_sketch_agg(_ck, {lg_k})").alias("sketch")
    )
    a = per_shard.select(F.col("shard").alias("shard_a"), F.col("sketch").alias("sk_a"))
    b = per_shard.select(F.col("shard").alias("shard_b"), F.col("sketch").alias("sk_b"))
    est = lambda c: F.expr(f"cast(hll_sketch_estimate({c}) as long)")  # noqa: E731
    return (
        # explicit hint on the inequality-only pair join: b is
        # shard-cardinality (KB of sketches) by construction, and an
        # implicit BNLJ degrades to CartesianProduct past the size
        # estimate (the passjoin sf10 lesson)
        a.join(F.broadcast(b), F.col("shard_a") < F.col("shard_b"))
        .select(
            "shard_a",
            "shard_b",
            est("sk_a").alias("est_a"),
            est("sk_b").alias("est_b"),
            F.expr("cast(hll_sketch_estimate(hll_union(sk_a, sk_b, true)) as long)").alias(
                "est_union"
            ),
        )
        .withColumn(
            "est_overlap",
            F.greatest(F.col("est_a") + F.col("est_b") - F.col("est_union"), F.lit(0)),
        )
        .orderBy("shard_a", "shard_b")
    )


# ---------------------------------------------------------------------------
# KMV / theta-style distinct sketches (bottom-k of a portable hash)
# ---------------------------------------------------------------------------
#
# HLL (above) is the right distinct sketch when only cardinalities and
# unions matter; the KMV ("k minimum values") sketch keeps the k smallest
# DISTINCT hash values of a column instead. That buys two things HLL can't
# offer here:
#
# 1. Theta-style SET OPERATIONS: intersections (and differences) estimate
#    directly from the retained samples — no inclusion-exclusion over
#    ~1.6%-error union estimates, whose error explodes for small overlaps.
# 2. ENGINE-EXACT reproducibility: the hash is the repo's portable
#    sha2-256 construction and the estimator is pure integer arithmetic,
#    so any engine (the DuckDB oracle included) reproduces the sketch AND
#    the estimate bit-for-bit. HLL estimates are only testable to error
#    bounds; KMV rows are value-verified like any exact query.
#
# Estimator (Bar-Yossef et al. 2002): with h_(k) the k-th smallest of n
# distinct uniform hashes in [0, R), E[h_(k)] = k/(n+1) * R, and
# (k-1) * R / h_(k) is the unbiased cardinality estimate (relative std
# error ~ 1/sqrt(k-2)). When fewer than k distinct hashes exist the
# sketch IS the distinct set and the count is exact.

KMV_BITS = 52
KMV_RANGE = 1 << KMV_BITS  # hashes in [0, 2^52): 13 hex digits of sha2-256.
# 52 bits (not the curation family's 60) keeps (k-1) * KMV_RANGE inside a
# BIGINT for any k <= 2048, so the estimate divides EXACTLY in int64 on
# every engine — no double rounding anywhere in the pipeline.
KMV_DEFAULT_K = 64
KMV_SEED = "kmv-v1"
# int64 estimator ceiling: (k-1) * 2^52 must stay below 2^63, and the
# intersection estimator's `common * 2^52` product is bounded by the same
# retained-count ceiling. ANSI mode is off, so an overflow WRAPS silently
# instead of erroring — enforce the ceiling up front (ADVICE r6).
KMV_MAX_K = 2048


def _check_k(k: int) -> None:
    if not 1 <= k <= KMV_MAX_K:
        raise ValueError(
            f"KMV k={k} outside [1, {KMV_MAX_K}]: (k-1)*2^{KMV_BITS} must fit "
            "in int64 or the estimator silently wraps (ANSI off)"
        )


def kmv_hash(col: Column, seed: str = KMV_SEED) -> Column:
    """Portable uniform hash in [0, 2^52): first 13 hex digits of sha2-256
    over ``seed || ':' || value`` (same construction as curate._seeded_hash,
    narrowed to 52 bits for exact integer estimator arithmetic)."""
    hx = F.substring(F.sha2(F.concat(F.lit(seed + ":"), col.cast("string")), 256), 1, 13)
    return F.conv(hx, 16, 10).cast("long")


def kmv_sketch(
    df: DataFrame,
    col: str,
    group_cols: list[str] | None = None,
    k: int = KMV_DEFAULT_K,
    seed: str = KMV_SEED,
    salt_parts: int = 8,
) -> DataFrame:
    """Per-group KMV sketch: (group..., n_rows, ks) where ``ks`` is the
    ascending array of the k smallest distinct ``kmv_hash`` values.

    Scale shape (the same two-phase salted prune as
    curate.domain_quota_sample_scaled): values shuffle as 8-byte hashes,
    never as content; phase 1 dedups + rank-filters per (group, salt) cell
    — groupBy dedup partial-aggregates map-side, and every window input is
    one salt cell, salt_parts-way parallel per group; phase 2 takes the
    exact bottom-k over <= salt_parts * k survivors per group, so the
    final per-group state is bounded by the dials, not the data."""
    _check_k(k)
    keys = list(group_cols or [])
    hashed = df.select(*keys, kmv_hash(F.col(col), seed).alias("_h"))
    counts = hashed.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    cells = hashed.withColumn("_salt", F.pmod(F.col("_h"), F.lit(salt_parts)))
    distinct_cells = cells.groupBy(*keys, "_salt", "_h").agg(F.lit(1).alias("_one"))
    w = Window.partitionBy(*(keys + ["_salt"])).orderBy("_h")
    survivors = (
        distinct_cells.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk", "_one", "_salt")
    )
    sketch = survivors.groupBy(*keys).agg(
        F.slice(F.array_sort(F.collect_set("_h")), 1, k).alias("ks")
    )
    if keys:
        return counts.join(sketch, keys).select(*keys, "n_rows", "ks")
    return counts.crossJoin(sketch).select("n_rows", "ks")


def kmv_estimate(ks: str, k: int = KMV_DEFAULT_K) -> Column:
    """Distinct-count estimate from a KMV array column (by NAME, so the
    whole estimator is one SQL expression) — pure int64 arithmetic.

    Exhaustive sketches (< k retained hashes) ARE the distinct set: exact
    count. Otherwise (k-1) * 2^52 div h_(k), exactly representable for
    k <= 2048 (see KMV_BITS note)."""
    _check_k(k)
    return F.expr(
        f"case when size({ks}) < {k} then cast(size({ks}) as bigint) "
        f"else {(k - 1) * KMV_RANGE}L div greatest(element_at({ks}, {k}), 1L) end"
    )


def kmv_union(ks_a: Column, ks_b: Column, k: int = KMV_DEFAULT_K) -> Column:
    """KMV of the UNION of two sketched sets: merge, dedup, re-take the
    bottom k — closed under union like any bottom-k sketch (array ops only,
    fine for sketch tables; the arrays are <= k elements)."""
    return F.slice(F.array_sort(F.array_union(ks_a, ks_b)), 1, k)


def kmv_intersection_estimate(ks_a: str, ks_b: str, k: int = KMV_DEFAULT_K) -> Column:
    """Theta-style intersection estimate |A ∩ B| from two KMV sketch array
    columns (by NAME — one SQL expression, exact int64 arithmetic).

    theta = min over the two sketches of each one's effective sampling
    threshold (its k-th smallest hash, or 2^52 when exhaustive); every
    retained hash below theta is a uniform 1-in-(2^52/theta) sample of its
    set, so |{h in ks_a ∩ ks_b : h < theta}| * 2^52 div theta estimates
    the intersection — and is EXACT when both sketches are exhaustive."""
    _check_k(k)

    def theta(ks: str) -> str:
        return (
            f"(case when size({ks}) < {k} then {KMV_RANGE}L "
            f"else element_at({ks}, {k}) end)"
        )

    th = f"least({theta(ks_a)}, {theta(ks_b)})"
    common = f"size(filter(array_intersect({ks_a}, {ks_b}), h -> h < {th}))"
    return F.expr(
        f"cast({common} as bigint) * {KMV_RANGE}L div greatest({th}, 1L)"
    )


def kmv_shard_distinct_report(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 4,
    k: int = KMV_DEFAULT_K,
) -> DataFrame:
    """KMV twin of cross_shard_distinct_report: per-shard distinct-content
    estimates plus the global union row (shard = -1), every number exactly
    reproducible by the SQL oracle. Shards by ``id mod n_shards`` (portable,
    unlike xxhash64). The global row is computed from the n_shards sketch
    ARRAYS (kilobytes), never by rescanning the documents."""
    sharded = docs.select(
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("int").alias("shard"),
        F.col(text_col).alias("_t"),
    )
    sk = kmv_sketch(sharded, "_t", ["shard"], k=k).cache()
    per_shard = sk.select("shard", "n_rows", kmv_estimate("ks", k).alias("est_distinct"))
    # array_distinct BEFORE truncating: a hash present in several shards'
    # bottom-k must occupy ONE merged slot (same semantics as kmv_union's
    # array_union), or cross-shard duplicate contents bias the global
    # estimate upward (ADVICE r6 — reproduced at +4.8% with injected dups)
    merged = sk.agg(
        F.sum("n_rows").alias("n_rows"),
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("ks")))), 1, k
        ).alias("ks"),
    )
    global_row = merged.select(
        F.lit(-1).cast("int").alias("shard"),
        "n_rows",
        kmv_estimate("ks", k).alias("est_distinct"),
    )
    return per_shard.unionByName(global_row).orderBy("shard")


def kmv_shard_overlap_matrix(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 4,
    k: int = KMV_DEFAULT_K,
) -> DataFrame:
    """Pairwise shard-overlap estimates from the KMV sketch table — the
    theta-style twin of `hll_shard_overlap_matrix`, with two upgrades the
    samples buy: the intersection is estimated DIRECTLY (retained hashes
    below the pair's theta), not by inclusion-exclusion over three noisy
    union estimates, and with the portable hash + int64 estimator every
    number is engine-exact (the SQL oracle reproduces the full matrix).

    Shape: one sketch build over the corpus (hashes shuffle as 8 B/row),
    then the n^2/2 pair rows join k-element ARRAYS — kilobytes of sketch,
    no data beyond the sketch table touched for any pair. Output per
    unordered pair (shard_a < shard_b): est_a, est_b, est_overlap."""
    sharded = docs.select(
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("int").alias("shard"),
        F.col(text_col).alias("_t"),
    )
    sk = kmv_sketch(sharded, "_t", ["shard"], k=k)
    a = sk.select(
        F.col("shard").alias("shard_a"),
        F.col("ks").alias("ks_a"),
        kmv_estimate("ks", k).alias("est_a"),
    )
    b = sk.select(
        F.col("shard").alias("shard_b"),
        F.col("ks").alias("ks_b"),
        kmv_estimate("ks", k).alias("est_b"),
    )
    # the pair join is an inequality over the KB-sized sketch table:
    # broadcast the right side so it plans as a BroadcastNestedLoopJoin
    # over n rows, never a CartesianProduct over data
    return (
        a.join(F.broadcast(b), F.col("shard_a") < F.col("shard_b"))
        .select(
            "shard_a",
            "shard_b",
            "est_a",
            "est_b",
            kmv_intersection_estimate("ks_a", "ks_b", k).alias("est_overlap"),
        )
        .orderBy("shard_a", "shard_b")
    )


# --- Deterministic mergeable QUANTILE sketch ---------------------------------
# Bottom-k-by-seeded-id-hash ROW sample: a uniform without-replacement
# sample whose membership is a pure function of (seed, ids) — so, like the
# KMV family, the whole sketch AND its quantile estimates are reproducible
# bit-for-bit by a SQL oracle (exact percentiles at 100 TB need a per-group
# sort of everything; this is the mergeable KB-sized swap with ~1/sqrt(k)
# rank error). Merge = union + distinct + truncate, the same closure as
# kmv_union (and the same r6 lesson: array_distinct BEFORE the slice, or
# overlapping shards double-count their shared rows).

QSK_SEED = "qsk-v1"
QSK_DEFAULT_K = 512
QSK_MAX_K = 65536


def _check_qsk_k(k: int) -> None:
    if not 1 <= k <= QSK_MAX_K:
        raise ValueError(f"quantile-sketch k={k} outside [1, {QSK_MAX_K}]")


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    id_col: str,
    group_cols: list[str] | None = None,
    k: int = QSK_DEFAULT_K,
    seed: str = QSK_SEED,
    salt_parts: int = 8,
) -> DataFrame:
    """Per-group quantile sketch: (group..., n_rows, sketch) where
    ``sketch`` is the ascending array of (h, v) structs for the k rows
    with the smallest seeded id-hash. Two-phase salted prune (the
    kmv_sketch shape): rows shuffle as (8-byte hash, value) pairs, each
    window input is one salt cell, final per-group state is bounded by
    the dials. Ordering key is (h, v) so a 52-bit hash collision cannot
    make cross-engine order ambiguous."""
    _check_qsk_k(k)
    keys = list(group_cols or [])
    hashed = df.select(
        *keys,
        kmv_hash(F.col(id_col), seed).alias("h"),
        F.col(value_col).cast("double").alias("v"),
    )
    counts = hashed.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    cells = hashed.withColumn("_salt", F.pmod(F.col("h"), F.lit(salt_parts)))
    w = Window.partitionBy(*(keys + ["_salt"])).orderBy("h", "v")
    survivors = (
        cells.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk", "_salt")
    )
    sketch = survivors.groupBy(*keys).agg(
        F.slice(F.array_sort(F.collect_list(F.struct("h", "v"))), 1, k).alias("sketch")
    )
    if keys:
        return counts.join(sketch, keys).select(*keys, "n_rows", "sketch")
    return counts.crossJoin(sketch).select("n_rows", "sketch")


def quantile_sketch_union(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
    k: int = QSK_DEFAULT_K,
    sketch_col: str = "sketch",
    n_rows_col: str = "n_rows",
) -> DataFrame:
    """Fold shard sketches into one per group: distinct-then-truncate over
    the concatenated pair lists (any global-bottom-k element is in its own
    shard's bottom-k, so the merge is EXACT — identical to sketching the
    union directly when shards are disjoint)."""
    _check_qsk_k(k)
    keys = list(group_cols or [])
    merged = F.slice(
        F.array_distinct(F.array_sort(F.flatten(F.collect_list(sketch_col)))), 1, k
    ).alias("sketch")
    n = F.sum(n_rows_col).cast("long").alias("n_rows")
    if keys:
        return sketches.groupBy(*keys).agg(n, merged)
    return sketches.agg(n, merged)


def quantile_sketch_estimate(
    sketch_df: DataFrame, probs_bp: dict[str, int], sketch_col: str = "sketch"
) -> DataFrame:
    """Quantile estimates from the sketch, one output column per entry of
    ``probs_bp`` (name -> basis points, e.g. {"p50": 5000}). Type-7-FLOOR
    selection on the value-sorted sample — index = (bp * (n_s - 1)) //
    10000, NO interpolation — so both engines pick the identical sample
    element (a data value passed through untouched; the lerp float-half
    trap from docs/NEXT.md never arises)."""
    vals = F.array_sort(F.transform(sketch_col, lambda x: x["v"]))
    ns = F.size(vals)
    cols = [
        F.element_at(
            vals, (F.floor((F.lit(bp) * (ns - 1)) / F.lit(10000)) + 1).cast("int")
        ).alias(name)
        for name, bp in probs_bp.items()
    ]
    keep = [c for c in sketch_df.columns if c != sketch_col]
    return sketch_df.select(*keep, *cols)


def exact_heavy_hitters(
    df: DataFrame, key_col: str, num: int, den: int
) -> DataFrame:
    """EXACT heavy hitters at unbounded key cardinality: every non-null
    key whose count satisfies ``cnt * den > n * num`` (strictly more than
    the fraction num/den of rows), with its exact count and share — the
    standard two-pass scheme:

    1. CANDIDATES: one scan through Spark's `freqItems` (the Karp/
       Misra-Gries counter family) — per-partition summaries of at most
       ~den/num counters, merged JVM-side. The guarantee is one-sided:
       every key above the threshold IS in the result, false positives
       possible — a superset, which is all a pruning pass needs. The
       collected candidate list is bounded by den/num (NOT by key
       cardinality), so it ships back as plan literals like the Bloom
       probe vehicle (operators/bloom.py).
    2. EXACT RECOUNT restricted to candidates: the `isin` drops
       non-candidates AT THE SCAN, so the groupBy shuffles at most
       den/num keys' partial counts per partition — at 100 TB the wire
       cost is (partitions x den/num), never (partitions x vocabulary).
       False positives from pass 1 die here against the exact threshold.

    Threshold arithmetic stays in INTEGERS (`cnt * den > n * num`) so an
    oracle's HAVING clause lands on the identical boundary — the repo's
    float-half-tie rule. Null keys are excluded (freqItems cannot track
    them and `isin` is null-rejecting); filter upstream if nulls matter.
    """
    if num <= 0 or den <= 0:
        raise ValueError("threshold num/den must be positive integers")
    cap = den // num
    if cap > 100_000:
        raise ValueError(
            f"support {num}/{den} admits up to {cap} heavy hitters; a list "
            "that size should ship as a Bloom/broadcast probe "
            "(operators/bloom.py), not freqItems plan literals"
        )
    keyed = df.select(key_col).filter(F.col(key_col).isNotNull())
    support = max(num / den, 1e-4)
    cands = keyed.freqItems([key_col], support=support).collect()[0][0]
    n = keyed.count()
    return (
        keyed.filter(F.col(key_col).isin(list(cands)))
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * F.lit(den) > F.lit(n * num))
        .withColumn("share", F.round(F.col("cnt") / F.lit(float(n)), 6))
    )
