"""Deduplication operators for training-data pipelines.

Four tiers, cheapest to richest, all shuffle-bounded for 100 TB:

1. exact: hash-groupBy on the raw text (one shuffle on the text value; at
   scale, group on ``xxhash64(text)`` so the shuffle key is 8 bytes, not the
   document).
2. normalized near-exact: same, after lowercase/whitespace collapse.
3. n-gram Jaccard with deterministic min-shingle blocking: candidates are
   pairs sharing the lexicographic-min shingle (an engine-portable 1-hash
   MinHash), then exact Jaccard within the block. One shuffle on the block
   key; block sizes are bounded because the min shingle is ~uniform.
4. MinHash + LSH banding (xxhash64 signatures): the real 100 TB near-dup
   path. k hash functions -> b bands of r rows; candidate pairs share a band
   hash. Shuffles: one on (band_idx, band_hash); no cross-join anywhere.

SimHash lives here too: 64-bit signature from token hashes; near-dup pairs
via 16-bit chunk banding + Hamming distance verify.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def shingle_rows(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, text) -> exploded distinct word-n-gram rows (doc_id, shingle).

    Relational construction — posexplode the tokens, n-gram via lead()
    windows, distinct — so every operator stays in whole-stage codegen.
    (A higher-order-function formulation `transform(sequence(...), i ->
    words[i] || ...)` is interpreted AND re-evaluates the split per element
    access: catastrophically slow. Measured ~100x difference.)

    Scale shape: one shuffle on doc_id for the lead() window; at 100 TB the
    window is partition-local after repartitioning by doc_id, and documents
    are independent so there is no skew beyond document length.
    """
    from crdb_changefeed_publisher_spark.tables import fan_out_scan

    # Fan out BEFORE the posexplode (r13, guide §2.3/§2.4): a single-row-
    # group corpus file plans as one scan task, pinning the split+explode
    # to one core; repartitioning by doc_id first parallelizes it AND the
    # lead() window below reuses the same hashpartitioning(doc_id), so the
    # exchange count is unchanged while the exchange itself carries whole
    # texts (~1x corpus bytes) instead of exploded word rows (~2x plus
    # per-row overhead). No-op when the scan is already wide.
    words = fan_out_scan(docs.select(id_col, text_col), id_col).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.trim(F.col(text_col)), " ")).alias("pos", "w"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.col("w")] + [F.lead("w", j).over(w) for j in range(1, n)]
    # NOTE: output may contain duplicate shingles per doc — consumers that
    # need set semantics dedup inside their aggregation (collect_set), and
    # min-hashing is duplicate-insensitive, so no standalone distinct()
    # shuffle is spent here.
    return (
        words.select("doc_id", *[c.alias(f"w{j}") for j, c in enumerate(leads)])
        .filter(F.col(f"w{n-1}").isNotNull())
        .select("doc_id", F.concat_ws(" ", *[f"w{j}" for j in range(n)]).alias("shingle"))
    )


def shingle_sets(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, text) -> (doc_id, sh: sorted distinct shingle array, block: min
    shingle). The arrays come out of an aggregation, so downstream set ops
    work on materialized data, never a re-evaluated expression tree."""
    return shingle_rows(docs, text_col, id_col, n).groupBy("doc_id").agg(
        F.array_sort(F.collect_set("shingle")).alias("sh"),
        F.min("shingle").alias("block"),
    )


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical documents: (keep_id, n_copies).

    Groups on sha2-256 of the text, not the text itself: the group-by
    shuffle then carries a 32-byte key per document instead of the full
    document — at 100 TB of mostly-unique text that is the difference
    between shuffling the corpus and shuffling 32 B/doc. A sha-256
    collision (~2^-128) is the accepted exactness contract (the same one
    content-addressed stores rely on); results are otherwise identical to
    grouping on the raw text, which the DuckDB oracle still does.

    The key is the RAW 32-byte digest (unhex), not the 64-char hex string:
    hex is random over a 16-symbol alphabet, which lz4 shuffle compression
    cannot shrink, so the hex form costs 2x the wire bytes for nothing.
    Measured A/B (wall + shuffle bytes, sf0.1 and 10x-unique corpus) in
    docs/SCALE.md "Content-addressed shuffle keys"; tools/ab_shuffle_keys.py
    reproduces it."""
    return (
        docs.groupBy(F.unhex(F.sha2(F.col(text_col), 256)).alias("_tkey"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("keep_id", "n_copies")
    )


def normalized_text(text: Column) -> Column:
    """Lowercase + collapse runs of whitespace — the standard near-exact key."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def normalized_duplicates(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    return (
        docs.groupBy(F.unhex(F.sha2(normalized_text(F.col(text_col)), 256)).alias("_tkey"))
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("keep_id", "n_copies")
    )


def jaccard_pairs_min_shingle(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Near-dup pairs by exact word-n-gram Jaccard, blocked on the
    lexicographic-min shingle.

    RETIRED from the registered surface (kept for the equivalence test):
    the lexicographic-min shingle is a heavy-hitter magnet — boilerplate
    shingles ("lorem ipsum", license headers) become the min for whole
    sub-corpora, and a block of m docs costs m^2/2 array_intersects. Round
    1's bench had this at 24.6 s / slowest query. Use
    `jaccard_pairs_minhash_block` (uniform hash blocking + size prefilter +
    skew-bounded join) instead.
    """
    sh = shingle_sets(docs, text_col, id_col, n)
    a = sh.select(
        F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"), F.col("block")
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"), F.col("block")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        a.join(b, "block")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("jaccard", F.round(inter / union, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def jaccard_pairs_minhash_block(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
    block_cap: int = 1000,
    candidate_budget: int | None = None,
    n_docs: int | None = None,
) -> DataFrame:
    """Near-dup pairs by exact word-n-gram Jaccard, blocked on the MIN
    PORTABLE HASH of the shingles (true 1-permutation MinHash).
    `n_docs` (corpus row count, used only to size the saturation budget)
    lets a caller with a cached count skip the guard's extra count job.

    Three scale properties the min-*shingle* variant lacked:

    1. **Uniform blocks.** The block key is the min of a hash over distinct
       shingles, so block collisions happen with probability = Jaccard
       similarity — boilerplate text no longer funnels unrelated docs into
       one mega-block.
    2. **Exact-safe size prefilter.** J(A,B) <= min(|A|,|B|)/max(|A|,|B|),
       so pairs failing the size-ratio bound are dropped BEFORE the
       array_intersect — no result change, large constant saving.
    3. **Skew-bounded join.** Blocks larger than `block_cap` are salted:
       the probe side splits into ceil(m/cap) salt groups, the build side
       replicates per salt; every pair still meets exactly once (result
       unchanged) but no single task sees more than ~cap probe rows — the
       m^2-in-one-task failure mode is gone even under adversarial input.

    Shuffles: shingle explode -> groupBy doc (partial agg), groupBy block
    count (tiny), pair equi-join on (block, salt). No O(n^2) stage.
    """
    from crdb_changefeed_publisher_spark.functions.phash import poly_hash

    rows = shingle_rows(docs, text_col, id_col, n)
    sets = (
        rows.withColumn("h", poly_hash(F.col("shingle")))
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_set("shingle")).alias("sh"),
            F.min("h").alias("block"),
        )
        # materialized once: consumed three times below (sizes + both join
        # sides), and exchange reuse does not cross the Python-UDF stage —
        # without this the shingle+hash pass runs per consumer. At cluster
        # scale persist to reliable storage instead (executor-loss safety).
        .localCheckpoint(eager=True)
    )
    sizes = sets.groupBy("block").agg(F.count(F.lit(1)).alias("m"))
    if candidate_budget is not None:
        # measured saturation guard (r9): min-hash blocking degenerates
        # when shingle diversity is small vs corpus size — every replica
        # of a saturated shingle space shares the globally-min-hash
        # shingles, so blocks grow with n and candidates with n^2
        block_candidate_guard(
            sizes, "m", docs.count() if n_docs is None else n_docs,
            candidate_budget, "jaccard_pairs_minhash_block",
        )
    # NOTE (r13): a window-count (`count() over partitionBy(block)`) looks
    # like it saves the sizes agg + join, but hashpartitioning(block)
    # subset-satisfies the (block, salt) pair join's distribution, so the
    # planner would then SKIP the (block, salt) exchange — putting every
    # salt group of a block back into one task and silently defeating the
    # skew cap this operator exists to provide. The agg + (AQE-broadcast)
    # join keeps the salted exchange physical; left as is.
    salted = sets.join(sizes, "block").withColumn(
        "n_salt", F.ceil(F.col("m") / F.lit(block_cap)).cast("int")
    )
    probe = salted.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh").alias("sh_a"),
        "block",
        F.pmod(F.xxhash64("doc_id"), F.col("n_salt")).cast("int").alias("salt"),
    )
    build = salted.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sh").alias("sh_b"),
        "block",
        F.explode(F.sequence(F.lit(0), F.col("n_salt") - 1)).alias("salt"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    size_ratio_ok = (
        F.least(F.size("sh_a"), F.size("sh_b"))
        / F.greatest(F.size("sh_a"), F.size("sh_b"))
    ) >= threshold
    return (
        probe.join(build, ["block", "salt"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(size_ratio_ok)
        .withColumn("jaccard", F.round(inter / union, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def block_candidate_guard(
    pops: DataFrame, pop_col: str, n_items: int,
    budget_per_item: int, what: str,
) -> None:
    """MEASURED saturation guard for any blocked candidate join (the
    executable form of docs/SCALE.md caveat (a): clustering inflates real
    blocks beyond any uniform-dial estimate, and only the data can say by
    how much). `pops` is the per-block population frame the caller
    already has; projected candidate pairs = sum(pop*(pop-1))/2. When
    that exceeds budget_per_item * n_items, the join is growing
    quadratically in corpus size and the plan REFUSES with the measured
    numbers instead of melting down — the r9 sf10 lesson: dedup_simhash's
    15-bit chunks held 568 candidates/doc at sf1 (10 s) and 5,670/doc at
    sf10 (1,299 s, pop ∝ n), a knee invisible one decade below, and the
    width dial was already at its tiling maximum so no sizing rule could
    fix it. Cost: one partial-agg pass over block counts (KB-scale).

    The refusal names the escape paths: a finer/banded signature (64-bit
    SimHash chunks, banded MinHash-LSH with r-row bands), a tighter
    qualifying threshold, or sampling — which one applies is corpus
    knowledge the caller has and this guard does not."""
    row = pops.agg(
        F.sum(F.col(pop_col) * (F.col(pop_col) - 1) / 2).alias("cand"),
        F.max(pop_col).alias("max_pop"),
        F.count(F.lit(1)).alias("n_blocks"),
    ).first()
    cand = int(row.cand or 0)
    if cand > budget_per_item * n_items:
        raise ValueError(
            f"{what}: blocked candidate join is saturated — {cand:,} "
            f"projected candidate pairs over {n_items:,} items "
            f"(= {cand // max(n_items, 1):,}/item, budget "
            f"{budget_per_item}/item; {row.n_blocks:,} blocks, max "
            f"population {row.max_pop:,}). Block populations are growing "
            "with the corpus (clustered signatures / saturated shingle "
            "space), so cost is quadratic from here. Use a finer or "
            "banded signature (64-bit simhash_pairs chunks, "
            "minhash_lsh_pairs r-row bands), tighten the qualifying "
            "threshold, or sample — see docs/SCALE.md 'Fifth decade'."
        )


def block_candidate_guard_bipartite(
    a: DataFrame, b: DataFrame, key_cols: list[str], n_items: int,
    budget_per_item: int, what: str,
) -> None:
    """`block_candidate_guard` for BIPARTITE blocked joins (index side x
    probe side on a shared block key, e.g. PassJoin's (l, slot, seg)):
    projected candidate rows = sum over keys of cnt_a * cnt_b. Costs one
    count-agg per side plus a join of the two count frames on the same
    key the candidate join would use — cheaper than the join it guards
    (ids never move, only counts). Raises with the measured numbers and
    the same escape paths when the per-item budget is exceeded."""
    ca = a.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_ca"))
    cb = b.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_cb"))
    row = ca.join(cb, key_cols).agg(
        F.sum(F.col("_ca") * F.col("_cb")).alias("cand"),
        F.max(F.col("_ca") * F.col("_cb")).alias("max_key"),
        F.count(F.lit(1)).alias("n_keys"),
    ).first()
    cand = int(row.cand or 0)
    if cand > budget_per_item * n_items:
        raise ValueError(
            f"{what}: blocked candidate join is saturated — {cand:,} "
            f"projected candidate rows over {n_items:,} items "
            f"(= {cand // max(n_items, 1):,}/item, budget "
            f"{budget_per_item}/item; {row.n_keys:,} shared block keys, "
            f"largest key contributes {row.max_key:,}). Block populations "
            "are growing with the corpus, so cost is quadratic from here. "
            "Tighten the qualifying threshold, use a coarser screen first "
            "(prefix-blocked fuzzy_pairs), or sample — see docs/SCALE.md "
            "'Fifth decade'."
        )


def _minhash_signatures(shingle_df: DataFrame, num_hashes: int) -> DataFrame:
    """(doc_id, shingle) rows -> (doc_id, sig: array<long>[k]).

    Shape matters: k plain xxhash64 projections over exploded shingle rows
    (whole-stage codegen), then groupBy-min. The min() aggregation is
    partial (map-side combine), so the shuffle carries k longs per doc,
    not the shingle sets — the property that makes MinHash work at 100 TB.
    """
    hashed = shingle_df.select(
        "doc_id",
        *[F.xxhash64(F.lit(i), F.col("shingle")).alias(f"h{i}") for i in range(num_hashes)],
    )
    return hashed.groupBy("doc_id").agg(
        F.array(*[F.min(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.2,
) -> DataFrame:
    """MinHash+LSH candidate pairs with estimated Jaccard.

    b bands of r = k/b minhashes; a pair is a candidate when any band's
    r-tuple matches. Estimated Jaccard = fraction of matching minhashes.
    The only shuffles are groupBys on band keys — no O(n^2) stage, which is
    what makes this the 100 TB near-dup strategy.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    # NOT checkpointed, deliberately (r13): a signature-table cut (the
    # minhash_portable_pairs treatment) would halve the duplicate
    # shingle+window evaluation across the aliased join sides, but it
    # also truncates the lineage the plan gate inspects — the map-side
    # partial_min property this operator exists to demonstrate
    # (tests/test_plans.py::test_minhash_has_partial_aggregation). The
    # row is retired (not benched); the registered portable twin carries
    # the checkpoint.
    sig = _minhash_signatures(shingle_rows(docs, text_col, id_col, n), num_hashes)
    band_rows = sig.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.xxhash64(*[F.element_at("sig", i * r + j + 1) for j in range(r)]).alias(
                            "band_hash"
                        ),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "sig", "band.band_idx", "band.band_hash")
    a = band_rows.select(
        F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"), "band_idx", "band_hash"
    )
    b = band_rows.select(
        F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"), "band_idx", "band_hash"
    )
    est = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)
    ) / F.lit(num_hashes)
    return (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.round(est, 4).alias("est_jaccard"))
        .distinct()
        .filter(F.col("est_jaccard") >= threshold)
    )


PORTABLE_MOD = 1_000_000_007
PORTABLE_BASE = 31
_PORTABLE_MAX_SHINGLE = 256
_PORTABLE_POWERS = [pow(PORTABLE_BASE, k, PORTABLE_MOD) for k in range(_PORTABLE_MAX_SHINGLE)]
# k affine transforms (a_i * h + b_i) mod p over the base string hash —
# coefficients are fixed so any engine reproduces the exact signature.
PORTABLE_COEFFS = [(2 * i + 3, 7 * i + 1) for i in range(8)]
# The 16-hash extension of the same family (first 8 identical): 4 bands of
# 4 is the production LSH shape (candidate recall 1-(1-j^4)^4 ~ 0.88 at
# j=0.8 vs ~0.65 for 2 bands) — used by the realism-corpus rows where
# recall is certified against planted truth (plans/realism.py).
PORTABLE_COEFFS16 = [(2 * i + 3, 7 * i + 1) for i in range(16)]


def _portable_string_hash(col: Column) -> Column:
    """Polynomial hash h = fold(h*31 + code) mod p over the string's chars,
    closed-form with a precomputed power table (same construction as
    text.fingerprint) — reproducible in any SQL engine with list lambdas.

    EXPRESSION form (interpreted HOF lambdas): kept only as the spec for the
    equivalence test vs functions/phash.py::poly_hash, which computes the
    identical value Arrow-vectorized ~5-10x faster. Production paths use
    poly_hash."""
    powers = F.array(*[F.lit(p) for p in _PORTABLE_POWERS])
    chars = F.split(F.substring(col, 1, _PORTABLE_MAX_SHINGLE), "")
    n = F.size(chars)
    contrib = F.zip_with(
        chars,
        F.reverse(F.slice(powers, 1, n.cast("int"))),
        lambda c, pw: (F.ascii(c).cast("long") * pw) % PORTABLE_MOD,
    )
    return F.aggregate(contrib, F.lit(0).cast("long"), lambda acc, x: acc + x) % PORTABLE_MOD


def portable_banded_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    coeffs: list[tuple[int, int]] | None = None,
    bands: int = 2,
) -> DataFrame:
    """(id, text) -> (doc_id, m0..m{k-1}, b0..b{bands-1}): the portable
    MinHash signature (k affine transforms of the polynomial shingle hash,
    partial-agg mins) plus its band hashes (polynomial combine of k/bands
    mins each). Defaults are the registered 8-hash/2-band shape; the
    realism rows use PORTABLE_COEFFS16 with 4 bands.

    Shared by `minhash_portable_pairs` (all-pairs within one corpus) and
    `incremental_dedup_report` (new shard vs existing corpus): the banding
    is a pure function of the text, so signatures computed over different
    corpus snapshots at different times are join-compatible — the property
    that makes INCREMENTAL near-dup possible (index once, probe per shard).
    """
    from crdb_changefeed_publisher_spark.functions.phash import poly_hash

    coeffs = PORTABLE_COEFFS if coeffs is None else coeffs
    k = len(coeffs)
    if bands < 1 or k % bands != 0:
        raise ValueError(
            f"portable_banded_signatures: k={k} hashes must divide evenly "
            f"into bands={bands} — a non-dividing shape would silently "
            "drop the trailing k % bands hashes from every band hash "
            "while est_jaccard still averages all k mins (an inconsistent "
            "LSH family)"
        )
    sh = shingle_rows(docs, text_col, id_col, n)
    base = sh.select("doc_id", poly_hash(F.col("shingle")).alias("h"))
    sig = base.groupBy("doc_id").agg(
        *[
            F.min((F.col("h") * a + b) % PORTABLE_MOD).alias(f"m{i}")
            for i, (a, b) in enumerate(coeffs)
        ]
    )
    r = k // bands
    band_hash = [
        sum(
            (F.col(f"m{i}") * _PORTABLE_POWERS[j + 1]) % PORTABLE_MOD
            for j, i in enumerate(range(band * r, (band + 1) * r))
        )
        % PORTABLE_MOD
        for band in range(bands)
    ]
    return sig.select(
        "doc_id",
        *[F.col(f"m{i}") for i in range(k)],
        *[band_hash[band].alias(f"b{band}") for band in range(bands)],
    )


def minhash_portable_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
    coeffs: list[tuple[int, int]] | None = None,
    bands: int = 2,
) -> DataFrame:
    """MinHash+LSH with an engine-portable hash family, so the entire
    pipeline (shingles -> k minhashes -> bands -> candidate pairs ->
    estimated Jaccard) is value-verifiable against a SQL oracle. Defaults
    are the registered 8-hash/2-band shape; the realism rows pass
    PORTABLE_COEFFS16 / 4 bands (the higher-recall production LSH shape).

    Same scale shape as minhash_lsh_pairs (k codegen'd hash projections,
    partial-aggregated mins, band equi-joins); the xxhash64 variant remains
    the faster production path — this one exists to keep the LSH *logic*
    under the correctness gate.
    """
    coeffs = PORTABLE_COEFFS if coeffs is None else coeffs
    k = len(coeffs)
    # MATERIALIZE the signature table before the pair joins: the banding
    # consumes it four times (2 bands x 2 sides), and Spark's exchange
    # reuse does not fire across the Python-UDF stage, so an unmaterialized
    # lineage recomputes the whole shingle+hash pass per consumer (measured
    # 1.39 -> 1.09 s at sf0.1). This is also the production posture — the
    # signature table is ~10 longs/doc, tiny next to the corpus, and at
    # cluster scale it is PERSISTED between runs (incremental dedup) rather
    # than localCheckpoint'ed (executor-loss safety; same note as
    # connected_components).
    banded = portable_banded_signatures(
        docs, text_col, id_col, n, coeffs=coeffs, bands=bands
    ).localCheckpoint(eager=True)
    # one equi-join per band, unioned then deduped — an OR-condition join
    # would plan as a nested loop; per-band equi-joins shuffle on the band
    # hash only (the LSH scale property)
    match_count = sum(
        F.when(F.col(f"am{i}") == F.col(f"bm{i}"), 1).otherwise(0) for i in range(k)
    )
    per_band = []
    for band_col in [f"b{band}" for band in range(bands)]:
        a = banded.select(
            F.col("doc_id").alias("doc_a"),
            *[F.col(f"m{i}").alias(f"am{i}") for i in range(k)],
            F.col(band_col).alias("bh"),
        )
        b = banded.select(
            F.col("doc_id").alias("doc_b"),
            *[F.col(f"m{i}").alias(f"bm{i}") for i in range(k)],
            F.col(band_col).alias("bh"),
        )
        per_band.append(
            a.join(b, "bh")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select(
                "doc_a", "doc_b", F.round(match_count / F.lit(k), 4).alias("est_jaccard")
            )
        )
    out = per_band[0]
    for pb in per_band[1:]:
        out = out.unionByName(pb)
    return out.distinct().filter(F.col("est_jaccard") >= threshold)


def minhash_portable_degrees(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
    coeffs: list[tuple[int, int]] | None = None,
    bands: int = 2,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Per-document near-dup DEGREE over the portable MinHash candidate
    graph: (doc_id, n_near_dups, best_est) for every document with at
    least one banded candidate whose estimated Jaccard >= threshold.

    The governance view of `minhash_portable_pairs`: output bounded by
    n_docs regardless of how clustered the corpus is (same argument as
    simhash_near_dup_degrees), the endpoint explode feeds a plain
    count/max groupBy with map-side partial aggregation. `pairs` lets a
    caller reuse an already-materialized pair table (the session-shared
    posture — one pair build per corpus snapshot, consumed by the pair
    report, the degree view, and recall audits)."""
    p = (
        pairs
        if pairs is not None
        else minhash_portable_pairs(
            docs, text_col, id_col, n, threshold, coeffs=coeffs, bands=bands
        )
    )
    # endpoint explode instead of union-of-projections (r13): one
    # evaluation of the pair pipeline feeds both endpoints — the union
    # form re-ran the band joins + distinct when `pairs` was not already
    # materialized (see linkage.linkage_degrees for the measured twin)
    ends = p.select(
        F.explode(
            F.array(F.col("doc_a").alias("doc_id"), F.col("doc_b").alias("doc_id"))
        ).alias("doc_id"),
        "est_jaccard",
    )
    return ends.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_near_dups"),
        F.max("est_jaccard").alias("best_est"),
    )


def simhash_signatures(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, text) -> (doc_id, sig: 64-bit SimHash long).

    Bit j of the signature is the sign of the sum of (+1/-1) votes from each
    token's xxhash64 bit j. Shape: explode tokens -> one codegen'd projection
    computing the token hash -> groupBy with 64 partial-aggregated bit-vote
    sums -> assemble the long. One shuffle carrying 64 ints per doc.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.col(text_col)), " ")).alias("tok"),
    )
    hashed = toks.select("doc_id", F.xxhash64("tok").alias("h"))
    votes = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(64)
        ]
    )
    sig: Column = F.lit(0).cast("long")
    for b in range(64):
        bit = F.lit(-(1 << 63) if b == 63 else (1 << b)).cast("long")
        sig = sig.bitwiseOR(F.when(F.col(f"v{b}") > 0, bit).otherwise(F.lit(0).cast("long")))
    return votes.select("doc_id", sig.alias("sig"))


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
    driver_edge_cap: int = 500_000,
) -> DataFrame:
    """Resolve near-dup PAIRS into CLUSTERS: (doc_id, cluster_id) where
    cluster_id is the minimum id in the document's connected component —
    the step that turns pairwise dedup output into an actionable keep list.

    Two paths, same result:

    - **Small-graph fast path**: when the distinct edge set fits under
      `driver_edge_cap` (bounded collect — 500k edge Rows cost on the
      order of 100-200 MB of driver heap; Row objects carry far more than
      their 16 payload bytes), run union-find on the driver and
      broadcast-join the labels back onto the nodes. Near-dup edge sets
      are tiny relative to the corpus by construction (they are the
      candidates that SURVIVED blocking + verify), so this path usually
      wins: 2 Spark jobs instead of O(diameter) rounds of join +
      aggregate scheduling. Labels keep the id column's own type (derived
      from `nodes`), so string/UUID doc ids work on both paths.
    - **Distributed fallback**: iterative min-label propagation — each
      round every node takes the min label among itself and its neighbors;
      converges in O(component diameter) rounds. Per round: one shuffle of
      the edge set joined to labels + a 1-row convergence aggregate (sum
      of labels is monotone non-increasing; equality => fixed point).
      Labels carry 16 bytes/doc; localCheckpoint per round keeps the plan
      constant-size. This is the path for a pathological edge set that
      outgrows the driver.
    """
    edges = pairs.select(F.col(a_col).alias("s"), F.col(b_col).alias("d"))
    edges = (
        edges.union(pairs.select(F.col(b_col).alias("s"), F.col(a_col).alias("d")))
        .distinct()
        .cache()  # pairs may be an expensive lineage (e.g. the full MinHash
        # pipeline); without this every propagation round recomputes it
    )

    edge_sample = edges.limit(driver_edge_cap + 1).collect()
    if len(edge_sample) <= driver_edge_cap:
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        for r in edge_sample:
            ra, rb = find(r.s), find(r.d)
            if ra != rb:
                # union by MIN id so the root IS the cluster label
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        labels = [(x, find(x)) for x in parent]
        spark = pairs.sparkSession
        id_type = nodes.schema[id_col].dataType
        label_schema = StructType(
            [StructField("doc_id", id_type), StructField("cluster_id", id_type)]
        )
        label_df = spark.createDataFrame(labels, label_schema)
        return nodes.select(F.col(id_col).alias("doc_id")).join(
            F.broadcast(label_df.withColumnRenamed("cluster_id", "_cc")), "doc_id", "left"
        ).select("doc_id", F.coalesce("_cc", "doc_id").alias("cluster_id"))
    labels = nodes.select(F.col(id_col).alias("doc_id"), F.col(id_col).alias("cluster_id"))
    # localCheckpoint (not cache) each round: the labels frame appears twice
    # per iteration (join input + select), so a lazy plan DOUBLES every
    # round — Catalyst analysis goes exponential after ~10 rounds.
    # Checkpointing replaces the logical plan with the materialized RDD,
    # keeping every round's plan constant-size. At cluster scale use
    # checkpoint() on reliable storage instead (executor-loss safety).
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.s == labels.doc_id)
            .groupBy(F.col("d"))
            .agg(F.min("cluster_id").alias("nmin"))
        )
        stepped = (
            labels.join(neighbor_min, labels.doc_id == neighbor_min.d, "left")
            .select(
                "doc_id",
                F.least(F.col("cluster_id"), F.coalesce("nmin", "cluster_id")).alias(
                    "new_cluster"
                ),
                F.col("cluster_id").alias("old_cluster"),
            )
            # lazy: the convergence aggregate below is the materializing
            # action, so each round runs ONE job, not two
            .localCheckpoint(eager=False)
        )
        # fixed point = zero labels changed this round; a direct change
        # count (not a numeric label sum) so any id type works
        n_changed = (
            stepped.agg(
                F.sum((F.col("new_cluster") != F.col("old_cluster")).cast("long"))
            ).collect()[0][0]
            or 0
        )
        labels = stepped.select("doc_id", F.col("new_cluster").alias("cluster_id"))
        if n_changed == 0:
            break
    return labels


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round (Kiveris et al., Connected Components in
    MapReduce and Beyond): every node connects its STRICTLY LARGER
    neighbors to the minimum of its closed neighborhood. Input/output
    edges are canonical (hi > lo); the emitted (v, m) keeps that
    orientation for free since m <= u < v."""
    sym = edges.select(F.col("hi").alias("u"), F.col("lo").alias("v")).union(
        edges.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    )
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("u", "mn").alias("m"))
    )
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: every node hangs itself and its smaller
    neighbors off the minimum of those smaller neighbors. Canonical
    (hi > lo) in, canonical out (every emitted pair has the round's
    minimum on the lo side)."""
    mins = edges.groupBy("hi").agg(F.min("lo").alias("m"))
    own = mins.select(F.col("hi").alias("a"), F.col("m").alias("b"))
    moved = (
        edges.join(mins, "hi")
        .filter(F.col("lo") != F.col("m"))
        .select(F.col("lo").alias("a"), F.col("m").alias("b"))
    )
    return (
        own.union(moved)
        .select(F.col("a").alias("hi"), F.col("b").alias("lo"))
        .distinct()
    )


def connected_components_altstar(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 30,
) -> DataFrame:
    """Connected components by ALTERNATING large-star/small-star rounds
    (Kiveris et al. 2014) — the 100 TB path `connected_components`'s
    min-label propagation cannot be: propagation needs O(component
    diameter) rounds (a 10k-link duplicate chain = 10k shuffles), while
    the alternating-star fixed point arrives in O(log n) rounds on ANY
    topology, each round two groupBy-min shuffles of the edge set keyed
    by node id. No driver-side state at all (contrast the union-find
    fast path's bounded collect); edges stay (id, id) longs end to end.

    Convergence is an exact fixed-point test (edge set unchanged — two
    exceptAll probes on the post-blocking edge set, which is tiny
    relative to the corpus by construction); at the fixed point the
    graph is a star forest whose roots are the component minima, so the
    label read-off is one join. Raises if max_iter rounds do not
    converge rather than returning a silently-partial labeling.

    Returns (doc_id, cluster_id) exactly like `connected_components`
    (singletons label themselves) — the two implementations are
    interchangeable and cross-validated in tests."""
    edges = (
        pairs.select(
            F.greatest(F.col(a_col), F.col(b_col)).alias("hi"),
            F.least(F.col(a_col), F.col(b_col)).alias("lo"),
        )
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    converged = edges.isEmpty()
    for _ in range(max_iter):
        if converged:
            break
        new = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        diff = (
            new.exceptAll(edges).union(edges.exceptAll(new)).limit(1).count()
        )
        edges, converged = new, diff == 0
    if not converged:
        raise RuntimeError(
            f"alternating-star did not converge in {max_iter} rounds "
            "(theoretical bound is O(log^2 n); raise max_iter)"
        )
    roots = edges.groupBy("hi").agg(F.min("lo").alias("_cc"))
    return (
        nodes.select(F.col(id_col).alias("doc_id"))
        .join(roots.withColumnRenamed("hi", "doc_id"), "doc_id", "left")
        .select("doc_id", F.coalesce("_cc", "doc_id").alias("cluster_id"))
    )


def embedding_cosine_pairs(
    corpus: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """Semantic near-dup pairs: cosine >= threshold within a blocking cell,
    computed as ONE numpy GEMM per cell via applyInPandas.

    Round 1 evaluated an interpreted HOF-lambda cosine per candidate pair
    (3.2 s at sf0.1); here each cell's m vectors cost a single m x m GEMM
    and each vector crosses the wire once (grouped by cell), not once per
    pair. At 100 TB the cell key comes from coarse quantization (IVF cell /
    LSH bucket) so cells stay bounded; the GEMM is cell-local, no O(n^2)
    global stage. Determinism: scores rounded to 6 decimals AFTER the
    >= threshold cut on the raw value (same order as the SQL oracle); pair
    orientation fixed by sorting ids ascending within the cell.
    """
    import numpy as np
    import pandas as pd

    from crdb_changefeed_publisher_spark.functions.vectors import as_double

    def cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_id")
        ids = pdf["_id"].to_numpy(dtype=np.int64)
        m = np.array(list(pdf["_v"]), dtype=np.float64)
        norms = np.sqrt((m * m).sum(axis=1))
        sims = (m @ m.T) / np.outer(norms, norms)
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= threshold
        return pd.DataFrame(
            {
                "vec_a": ids[ia[keep]],
                "vec_b": ids[ib[keep]],
                "cos_sim": np.round(sims[ia[keep], ib[keep]], 6),
            }
        )

    v = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(cell_col).alias("_cell"),
        as_double(F.col(vec_col)).alias("_v"),
    )
    return v.groupBy("_cell").applyInPandas(cell, "vec_a long, vec_b long, cos_sim double")


SIMHASH_PORTABLE_BITS = 30
# one affine parity transform per signature bit (see docstring below)
SIMHASH_COEFFS = [(2 * j + 3, 7 * j + 1) for j in range(SIMHASH_PORTABLE_BITS)]


def simhash_portable_signatures(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, text) -> (doc_id, sig: 30-bit SimHash long) using the portable
    polynomial token hash, so the entire signature is value-reproducible in
    any SQL engine (the xxhash64 64-bit variant in `simhash_signatures`
    stays as the faster engine-native form).

    Same shape as the 64-bit variant: explode tokens -> one vectorized hash
    projection -> groupBy with 30 partial-aggregated bit-vote sums (map-side
    combine; the shuffle carries 30 ints per doc) -> assemble the long.
    Duplicate tokens vote once per occurrence (term-frequency weighting,
    standard SimHash).

    Bit j is the PARITY OF AN AFFINE TRANSFORM ``(h*a_j + b_j) mod p`` of
    the token hash, not raw bit j of h: short tokens hash to small values
    whose high bits are all zero, which correlated every signature's high
    half and produced ~20% of all pairs as candidates. The affine parity
    family mixes independently of token length (same trick as the portable
    MinHash coefficients). h < 2^30 and a_j < 2^7, so the product stays
    far inside int64 on any engine.
    """
    from crdb_changefeed_publisher_spark.functions.phash import poly_hash

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.col(text_col)), " ")).alias("tok"),
    )
    hashed = toks.select("doc_id", poly_hash(F.col("tok")).alias("h"))
    votes = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    ((F.col("h") * a + b) % PORTABLE_MOD).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"v{j}")
            for j, (a, b) in enumerate(SIMHASH_COEFFS)
        ]
    )
    sig: Column = F.lit(0).cast("long")
    for b in range(SIMHASH_PORTABLE_BITS):
        sig = sig + F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return votes.select("doc_id", sig.alias("sig"))


def banding_chunk_bits_for(
    n_items: int, target_block: int = 256, sig_bits: int = 64, n_chunks: int = 4
) -> int:
    """Executable form of the hamming-band sizing rule (docs/SCALE.md):
    expected block population is n_items / 2^chunk_bits and the candidate
    join is quadratic in it, so chunk_bits = ceil(log2(n_items /
    target_block)), clamped to [4, sig_bits // n_chunks] — the chunks must
    still tile the signature (pigeonhole recall holds for hamming <=
    n_chunks - 1 only when they do). Two caveats the rule cannot fix,
    both measured at sf1: (a) signature CLUSTERING (e.g. a tiny
    vocabulary) inflates real blocks beyond the uniform estimate — treat
    target_block as the uniform-case floor; (b) when the qualifying pair
    set itself is huge (the sf1 fixture has ~3.6e8 pairs within hamming
    8/30 — a 31-word-vocab artifact), the job is OUTPUT-bound and no
    blocking dial helps; cap or aggregate the pair stream instead.

    Computed in INTEGER arithmetic (smallest c with target_block*2^c >=
    n_items — identical to the ceil-log2 form) so a SQL oracle can derive
    the same dial from a COUNT(*) without a float log2 boundary."""
    hi = max(4, sig_bits // n_chunks)
    c = 4
    while c < hi and (target_block << c) < n_items:
        c += 1
    return c


def _explode_sig_chunks(
    sig: DataFrame, n_chunks: int, chunk_bits: int, extra_cols: tuple[str, ...] = ()
) -> DataFrame:
    """(doc_id, sig) -> one row per chunk: (doc_id, sig, *extra_cols,
    chunk_idx, chunk). `extra_cols` ride through the explode so a caller
    never re-joins the signature table just to recover a column it already
    had (the media near-dup `kind` case).

    The banding dial for SimHash blocking. Bucket space = 2^chunk_bits per
    chunk position; expected docs per bucket ~ n_docs / 2^chunk_bits, and
    the candidate join is quadratic in that block size — so chunk_bits must
    GROW with corpus size: chunk_bits >= log2(n_docs / target_block_size).
    Pigeonhole recall: any pair within Hamming <= n_chunks - 1 is guaranteed
    to share a chunk; beyond that the blocking is approximate (standard
    SimHash banding trade-off). See docs/SCALE.md."""
    mask = (1 << chunk_bits) - 1
    return sig.select(
        "doc_id",
        "sig",
        *extra_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_idx"),
                        F.shiftright("sig", i * chunk_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "sig", *extra_cols, "c.chunk_idx", "c.chunk")


def simhash_portable_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    n_chunks: int = 2,
    chunk_bits: int = 15,
    candidate_budget: int | None = None,
) -> DataFrame:
    """Near-dup pairs by portable 30-bit SimHash: block on each of the
    `n_chunks` `chunk_bits`-bit chunks (pigeonhole candidate generation),
    then exact Hamming verify — every value (signature, chunk, hamming) is
    oracle-checkable.

    The (2, 15) default is the sf-fixture setting, NOT the 100 TB setting:
    32k buckets saturate around millions of docs. Size chunk_bits per the
    rule in docs/SCALE.md (the two chunkings must tile the 30-bit
    signature: n_chunks * chunk_bits <= 30 wastes the remainder bits).
    """
    # materialized once: the chunk join consumes the signature frame on
    # both sides, and exchange reuse does not cross the Python-UDF stage
    # (same trade as minhash_portable_pairs — measured ~1.9 -> ~1.1 s at
    # sf0.1; at cluster scale persist the signature table instead)
    sig = simhash_portable_signatures(docs, text_col, id_col).localCheckpoint(eager=True)
    chunks = _explode_sig_chunks(sig, n_chunks, chunk_bits)
    if candidate_budget is not None:
        # measured saturation guard (r9 sf10 knee: clustered signatures
        # at the tiling-max width grew blocks with n — 127x per decade)
        pops = chunks.groupBy("chunk_idx", "chunk").agg(
            F.count(F.lit(1)).alias("pop")
        )
        block_candidate_guard(
            pops, "pop", sig.count(), candidate_budget,
            "simhash_portable_pairs",
        )
    a = chunks.select(
        F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"), "chunk_idx", "chunk"
    )
    b = chunks.select(
        F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"), "chunk_idx", "chunk"
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("int")
    return (
        a.join(b, ["chunk_idx", "chunk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_near_dup_degrees(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    n_chunks: int = 2,
    chunk_bits: int = 15,
    candidate_budget: int | None = None,
    n_docs: int | None = None,
) -> DataFrame:
    """Per-document near-dup DEGREE over the portable-SimHash candidate
    graph: (doc_id, n_near_dups, min_hamming) for every document with at
    least one neighbor within `max_hamming` sharing a signature chunk.

    This is the scale-bounded registered form of the pair stream (r7
    verdict #3): `simhash_portable_pairs` stays the library primitive for
    consumers that need the edges, but its output is the qualifying pair
    SET — which on a pathologically clustered corpus (sf1's 31-word vocab:
    ~3.6e8 pairs) grows quadratic-ish no matter the blocking dial. The
    degree view's output is bounded by n_docs, and the heavy distinct is
    per-(doc, neighbor) with map-side partial aggregation instead of a
    global pair-set shuffle + sort.

    Shuffle shape: the pair-level dedup runs on a < b ORDERED pairs (half
    the candidate volume of a symmetric join), then each distinct pair
    explodes into its two directed endpoint rows feeding a plain
    count/min groupBy — partial aggregation collapses that second pass to
    ~n_docs rows per partition before it ever shuffles. A (doc, neighbor)
    pair found via several chunk collisions still counts once, and
    min_hamming is collision-count invariant."""
    sig = simhash_portable_signatures(docs, text_col, id_col).localCheckpoint(eager=True)
    chunks = _explode_sig_chunks(sig, n_chunks, chunk_bits)
    if candidate_budget is not None:
        # measured saturation guard (r9 sf10 knee: clustered signatures
        # at the tiling-max width grew blocks with n — 127x per decade)
        pops = chunks.groupBy("chunk_idx", "chunk").agg(
            F.count(F.lit(1)).alias("pop")
        )
        block_candidate_guard(
            pops, "pop", sig.count() if n_docs is None else n_docs,
            candidate_budget, "simhash_near_dup_degrees",
        )
    a = chunks.select(
        F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"), "chunk_idx", "chunk"
    )
    b = chunks.select(
        F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"), "chunk_idx", "chunk"
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("int")
    pairs = (
        a.join(b, ["chunk_idx", "chunk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    both = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("doc_a").alias("doc_id"),
                    F.col("hamming").alias("hamming"),
                ),
                F.struct(
                    F.col("doc_b").alias("doc_id"),
                    F.col("hamming").alias("hamming"),
                ),
            )
        ).alias("e")
    ).select("e.doc_id", "e.hamming")
    return both.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_near_dups"),
        F.min("hamming").alias("min_hamming"),
    )


def content_key_index(
    corpus: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(_tkey): the distinct sha2-256 content digests of a corpus — one
    of the two ids-free indexes a production pipeline PERSISTS between
    shard ingests (the other is band_index). 32 B/doc, shrinking under
    distinct; the corpus text itself never leaves its scan."""
    return corpus.select(
        F.unhex(F.sha2(F.col(text_col), 256)).alias("_tkey")
    ).distinct()


def band_index(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    coeffs: list[tuple[int, int]] | None = None,
    bands: int = 2,
) -> DataFrame:
    """(band_idx, band_hash): the distinct LSH band hashes of a corpus
    under the portable MinHash family — the near-dup probe index
    incremental_dedup_report joins each arriving shard against. Two longs
    per doc before distinct; a pure function of the text (see
    portable_banded_signatures), so indexes built over different corpus
    snapshots at different times stay join-compatible."""
    sig = portable_banded_signatures(
        corpus, text_col, id_col, n, coeffs=coeffs, bands=bands
    )
    return (
        sig.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(band).alias("band_idx"),
                            F.col(f"b{band}").alias("band_hash"),
                        )
                        for band in range(bands)
                    ]
                )
            ).alias("b")
        )
        .select("b.band_idx", "b.band_hash")
        .distinct()
    )


def incremental_dedup_report(
    corpus: DataFrame | None,
    shard: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    coeffs: list[tuple[int, int]] | None = None,
    bands: int = 2,
    corpus_keys: DataFrame | None = None,
    corpus_bands: DataFrame | None = None,
) -> DataFrame:
    """Dedup a NEW SHARD against an EXISTING corpus without rescanning the
    corpus pairwise — the operational shape of dedup at 100 TB, where the
    corpus is petabytes of already-kept documents and each arriving shard
    must be admitted incrementally (a full-corpus pair join per shard would
    be quadratic in corpus size, repeated per ingest).

    Output: one row per shard document that survives WITHIN-SHARD exact
    dedup — (keep_id, n_copies, vs_corpus) where vs_corpus is
    'exact' (byte-identical text exists in the corpus), 'near' (any
    portable-MinHash band hash collides with a corpus document's band:
    the standard LSH candidate screen — downstream either drops these or
    verifies with exact Jaccard via the pairs operators), else 'new'.

    Scale shape — the corpus side reduces to two ids-free indexes that a
    production pipeline PERSISTS between shards rather than recomputing:
      * content-hash index: distinct sha2-256 of corpus text (32 B/doc) —
        content_key_index;
      * band index: distinct (band_idx, band_hash) pairs (two longs/doc)
        — band_index.
    `corpus_keys` / `corpus_bands` accept exactly those persisted tables
    (r12 verdict #4: the realism tier materializes them beside its pair
    cache — plans/realism.py), in which case `corpus` may be None and
    shard admission reads NO corpus-sized input at all. The shard
    (typically ~1e-4 of corpus size) probes both with plain equi-joins;
    nothing quadratic anywhere, and the corpus text is never shuffled —
    only its hashes. `coeffs`/`bands` select the LSH family (default: the
    registered 8-hash/2-band shape; the realism tier certifies the
    16-hash/4-band production shape against planted cross-shard clones).
    """
    if corpus is None and (corpus_keys is None or corpus_bands is None):
        raise ValueError(
            "incremental_dedup_report: pass a corpus DataFrame or BOTH "
            "persisted indexes (corpus_keys + corpus_bands)"
        )
    shard_keeps = (
        shard.groupBy(F.unhex(F.sha2(F.col(text_col), 256)).alias("_tkey"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
            # all texts in a sha2 group are identical (collision contract as
            # exact_duplicates); min() just picks the representative
            F.min(text_col).alias("_text"),
        )
        # NOT checkpointed: a lineage cut here was tried (r13) and reverted —
        # it erased the shard scan from inputFiles(), breaking the realism-
        # tier certification that pins file-level provenance ("the corpus is
        # never read" is asserted from the report's input file list, which a
        # checkpoint truncates). The keeps table feeds the band-signature
        # pass and both final join sides, so the shard scan + sha2 groupBy
        # run per consumer — shard-sized by the operator's contract (~1e-4
        # of corpus), the provenance guarantee is worth more than the cut.
    )
    if corpus_keys is None:
        corpus_keys = content_key_index(corpus, text_col)
    corpus_keys = corpus_keys.select("_tkey", F.lit(1).alias("_exact"))

    def _bands(df: DataFrame, id_alias: str) -> DataFrame:
        sig = portable_banded_signatures(
            df, text_col, id_col, n, coeffs=coeffs, bands=bands
        )
        return sig.select(
            F.col("doc_id").alias(id_alias),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(band).alias("band_idx"),
                            F.col(f"b{band}").alias("band_hash"),
                        )
                        for band in range(bands)
                    ]
                )
            ).alias("b"),
        ).select(id_alias, "b.band_idx", "b.band_hash")

    if corpus_bands is None:
        corpus_bands = band_index(
            corpus, text_col, id_col, n, coeffs=coeffs, bands=bands
        )
    corpus_bands = corpus_bands.select("band_idx", "band_hash")
    keep_docs = shard_keeps.select(F.col("keep_id").alias(id_col), F.col("_text").alias(text_col))
    near_hits = (
        _bands(keep_docs, "keep_id")
        .join(corpus_bands, ["band_idx", "band_hash"], "left_semi")
        .select("keep_id")
        .distinct()
        .withColumn("_near", F.lit(1))
    )
    return (
        shard_keeps.join(corpus_keys, "_tkey", "left")
        .join(near_hits, "keep_id", "left")
        .select(
            "keep_id",
            "n_copies",
            F.when(F.col("_exact").isNotNull(), F.lit("exact"))
            .when(F.col("_near").isNotNull(), F.lit("near"))
            .otherwise(F.lit("new"))
            .alias("vs_corpus"),
        )
    )


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 16,
    n_chunks: int = 4,
    chunk_bits: int = 16,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs by 64-bit SimHash: block on each of the `n_chunks`
    `chunk_bits`-bit chunks (pigeonhole: any pair within Hamming <=
    n_chunks - 1 shares a chunk), then exact Hamming verify. Same banding
    dial as the portable variant — see docs/SCALE.md for sizing chunk_bits
    to the corpus.

    `signatures` lets a caller that already materialized
    simhash_signatures(docs) (e.g. to run block_candidate_guard on the
    chunk populations first) reuse it instead of paying the signature
    pass twice (r10 advice: the realism tool's recorded simhash64 wall
    time included exactly that redundant pass).
    """
    sig = (
        signatures
        if signatures is not None
        else simhash_signatures(docs, text_col, id_col).localCheckpoint(eager=True)
    )
    chunks = _explode_sig_chunks(sig, n_chunks, chunk_bits)
    a = chunks.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"), "chunk_idx", "chunk")
    b = chunks.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"), "chunk_idx", "chunk")
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        a.join(b, ["chunk_idx", "chunk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
