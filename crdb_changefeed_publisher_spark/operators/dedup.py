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
    words = docs.select(
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
    """Groups of byte-identical documents: (keep_id, n_copies, member ids)."""
    return (
        docs.groupBy(F.col(text_col).alias("dup_text"))
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
        docs.groupBy(normalized_text(F.col(text_col)).alias("norm_text"))
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
    lexicographic-min shingle (portable single-hash MinHash): only pairs
    sharing their min shingle are compared, then exact Jaccard filters.

    Scale shape: shuffle on the 1 min-shingle key (bounded blocks), pairs
    within block via self-join, set ops on already-distinct shingle arrays.
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


def _portable_string_hash(col: Column) -> Column:
    """Polynomial hash h = fold(h*31 + code) mod p over the string's chars,
    closed-form with a precomputed power table (same construction as
    text.fingerprint) — reproducible in any SQL engine with list lambdas."""
    powers = F.array(*[F.lit(p) for p in _PORTABLE_POWERS])
    chars = F.split(F.substring(col, 1, _PORTABLE_MAX_SHINGLE), "")
    n = F.size(chars)
    contrib = F.zip_with(
        chars,
        F.reverse(F.slice(powers, 1, n.cast("int"))),
        lambda c, pw: (F.ascii(c).cast("long") * pw) % PORTABLE_MOD,
    )
    return F.aggregate(contrib, F.lit(0).cast("long"), lambda acc, x: acc + x) % PORTABLE_MOD


def minhash_portable_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """MinHash+LSH with an engine-portable hash family, so the entire
    pipeline (shingles -> k minhashes -> 2 bands of 4 -> candidate pairs ->
    estimated Jaccard) is value-verifiable against a SQL oracle.

    Same scale shape as minhash_lsh_pairs (k codegen'd hash projections,
    partial-aggregated mins, band equi-joins); the xxhash64 variant remains
    the faster production path — this one exists to keep the LSH *logic*
    under the correctness gate.
    """
    sh = shingle_rows(docs, text_col, id_col, n)
    base = sh.select("doc_id", _portable_string_hash(F.col("shingle")).alias("h"))
    k = len(PORTABLE_COEFFS)
    sig = base.groupBy("doc_id").agg(
        *[
            F.min((F.col("h") * a + b) % PORTABLE_MOD).alias(f"m{i}")
            for i, (a, b) in enumerate(PORTABLE_COEFFS)
        ]
    )
    r = k // 2
    band_hash = [
        sum(
            (F.col(f"m{i}") * _PORTABLE_POWERS[j + 1]) % PORTABLE_MOD
            for j, i in enumerate(range(band * r, (band + 1) * r))
        )
        % PORTABLE_MOD
        for band in range(2)
    ]
    banded = sig.select(
        "doc_id",
        *[F.col(f"m{i}") for i in range(k)],
        band_hash[0].alias("b0"),
        band_hash[1].alias("b1"),
    )
    # one equi-join per band, unioned then deduped — an OR-condition join
    # would plan as a nested loop; per-band equi-joins shuffle on the band
    # hash only (the LSH scale property)
    match_count = sum(
        F.when(F.col(f"am{i}") == F.col(f"bm{i}"), 1).otherwise(0) for i in range(k)
    )
    per_band = []
    for band_col in ("b0", "b1"):
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
    return (
        per_band[0]
        .unionByName(per_band[1])
        .distinct()
        .filter(F.col("est_jaccard") >= threshold)
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


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 16,
) -> DataFrame:
    """Near-dup pairs by SimHash: block on each of the four 16-bit chunks
    (pigeonhole: any pair within Hamming<=3-per-chunk shares a chunk when
    distance is small), then exact Hamming verify.
    """
    sig = simhash_signatures(docs, text_col, id_col)
    chunks = sig.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_idx"),
                        F.shiftright("sig", i * 16).bitwiseAND(F.lit(0xFFFF)).alias("chunk"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "sig", "c.chunk_idx", "c.chunk")
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
