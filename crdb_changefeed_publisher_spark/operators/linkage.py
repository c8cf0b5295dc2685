"""Fuzzy record linkage: edit-distance near-dup join with prefix blocking.

String similarity is a different axis from the set-similarity family in
operators/dedup.py: Levenshtein distance catches character-level mutations
(typos, OCR noise, small in-place edits) that leave word-shingle sets almost
unchanged, and conversely a paragraph reshuffle with identical words has a
huge edit distance but Jaccard ~1. A curation pipeline wants both lenses.

100 TB posture — identical to every dedup operator here:

- Candidates come from an EQUI-join on a blocking key (normalized prefix),
  never an all-pairs stage. Block population for real prose is near-unique
  except for true near-dups (the property the sorted-neighborhood / PassJoin
  family exploits), so the candidate join is linear-ish in corpus size.
- The length pre-band is EXACT, not approximate: ``|len(a) - len(b)| <= k``
  is a necessary condition for ``levenshtein(a, b) <= k`` (every edit changes
  the length by at most 1), so applying it before the DP loses nothing.
- The DP itself runs JVM-side with Spark's banded early-exit variant
  (``levenshtein(l, r, threshold)`` is O(k*n) instead of O(n*m) and bails
  as soon as the band exceeds the threshold).
- Blocking dials (prefix_len, max_dist) are plan literals mirrored by the
  SQL oracle, so both engines compute identical semantics and the driver
  hash-compares exact values.

Blocking recall argument: two strings within edit distance k share their
first ``prefix_len`` normalized characters unless one of the <= k edits
lands inside the prefix window. Mutation-style duplicates spread edits
across the document, so a 24-char prefix on 150-400-char texts catches the
planted fixture pairs exactly (measured at sf0.01/sf0.1: every pair within
distance 16 shares the 24-char prefix). The honest boundary: an adversarial
edit inside the first 24 chars escapes the block — `fuzzy_pairs_passjoin`
(below, r9) closes it with EXACT recall via the PassJoin k+1-segment
pigeonhole at the documented (k+1)x candidate fan-out; `fuzzy_pairs`
remains the cheap large-k screen. See also the saturation guard pattern
in operators/dedup.py::banding_chunk_bits_for for when block populations
grow past the quadratic-candidate knee.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalized_link_key(text: Column) -> Column:
    """Case-fold and strip everything but letters and spaces — the
    normalization both engines can reproduce byte-identically (DuckDB:
    lower(regexp_replace(text, '[^a-zA-Z ]', '', 'g')))."""
    return F.lower(F.regexp_replace(text, "[^a-zA-Z ]", ""))


def fuzzy_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dist: int = 16,
    prefix_len: int = 24,
) -> DataFrame:
    """All (doc_a < doc_b, dist) pairs with normalized edit distance
    <= max_dist among candidates sharing the prefix_len-char block.

    Shuffles once on the block key; the length band prunes the DP exactly;
    the threshold DP bails early on the survivors.
    """
    t = docs.select(
        F.col(id_col).alias("id"),
        normalized_link_key(F.col(text_col)).alias("t"),
    )
    k = t.select(
        "id",
        "t",
        F.substring("t", 1, prefix_len).alias("p"),
        F.length("t").alias("len"),
    )
    # One normalize pass, not two (r13, guide §5 — the fuzzy_pairs_passjoin
    # cut applied to the prefix screen): both join sides consume k under
    # DIFFERENT aliases (doc_a/ta vs doc_b/tb), so exchange reuse cannot
    # dedup the subtrees and the scan + regexp normalize ran per side.
    # ~(id + normalized text + prefix + len)/doc — the smallest frame in
    # the pipeline; at cluster scale persist to reliable storage instead.
    # Interleaved steal-free A/B at sf0.1 (doc_fuzzy_linkage, results
    # equal): min 1.75 -> 0.88 s, med 1.93 -> 0.98.
    k = k.localCheckpoint(eager=False)
    a = k.select(
        F.col("id").alias("doc_a"), F.col("t").alias("ta"), "p", F.col("len").alias("la")
    )
    b = k.select(
        F.col("id").alias("doc_b"), F.col("t").alias("tb"), "p", F.col("len").alias("lb")
    )
    return (
        a.join(b, "p")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            # exact pruning: any single edit moves length by at most 1
            & (F.abs(F.col("la") - F.col("lb")) <= max_dist)
        )
        # banded DP: returns -1 when the distance exceeds the threshold
        .withColumn("dist", F.levenshtein("ta", "tb", max_dist))
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
        .select("doc_a", "doc_b", "dist")
    )


def linkage_degrees(pairs: DataFrame) -> DataFrame:
    """Per-doc linkage summary — output bounded by n_docs regardless of how
    pathological the pair stream gets (the dedup_simhash lesson: register
    the aggregate, keep the raw pair stream as the library function).

    Columns: doc_id, n_links, min_dist, nearest (the smallest-id partner at
    the minimum distance — deterministic via lexicographic struct min).
    """
    # One pass over the pair stream, not two (r13): the union-of-
    # projections form evaluated the whole upstream pair pipeline twice —
    # exchange reuse dedups identical shuffles but NOT the post-shuffle
    # candidate join + threshold DP, so both linkage rows paid the verify
    # stage double. Exploding each pair into its two endpoint structs is
    # the same rows from a single evaluation, all codegen.
    ends = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("doc_a").alias("doc_id"), F.col("doc_b").alias("nbr")),
                F.struct(F.col("doc_b").alias("doc_id"), F.col("doc_a").alias("nbr")),
            )
        ).alias("e"),
        "dist",
    ).select("e.doc_id", "e.nbr", "dist")
    return (
        ends.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.min("dist").alias("min_dist"),
            F.min(F.struct("dist", "nbr")).alias("_best"),
        )
        .select("doc_id", "n_links", "min_dist", F.col("_best.nbr").alias("nearest"))
    )


def block_saturation(
    docs: DataFrame,
    *,
    text_col: str = "text",
    prefix_len: int = 24,
) -> DataFrame:
    """One-row diagnostic for the blocking dial: (n_docs, n_blocks,
    max_block, p99_block). The candidate join's cost is
    sum(block_pop^2) / 2, so a max_block in the thousands means one
    straggler task doing quadratic work — the knee the SimHash banding
    saturation guard refuses past (operators/dedup.py). Run this before
    trusting a new corpus: real prose keeps prefix blocks near-singleton
    except true near-dups; templated corpora (boilerplate headers, log
    lines) saturate and need a longer prefix or content-defined key
    (skip the boilerplate span first: operators/text.py). One partial-agg
    pass over the normalized prefix; the text never shuffles."""
    pops = (
        docs.select(
            F.substring(normalized_link_key(F.col(text_col)), 1, prefix_len).alias("p")
        )
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("pop"))
    )
    return pops.agg(
        F.sum("pop").alias("n_docs"),
        F.count(F.lit(1)).alias("n_blocks"),
        F.max("pop").alias("max_block"),
        F.percentile_approx("pop", 0.99).alias("p99_block"),
    )


def fuzzy_pairs_passjoin(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dist: int = 4,
    candidate_budget: int | None = None,
    n_docs: int | None = None,
) -> DataFrame:
    """All (doc_a < doc_b, dist) pairs with normalized edit distance
    <= max_dist — EXACT RECALL, no blocking escape (the PassJoin upgrade
    the prefix-blocking docstring above documents; Li/Deng/Feng, PVLDB
    2011). Where `fuzzy_pairs` misses a pair whose edit lands inside the
    prefix window, this one cannot miss any pair at all:

    * INDEX side: each string of length l >= k+1 splits into k+1
      contiguous segments (even partition, floor boundaries). If
      ed(x, y) <= k, the <= k edits touch at most k segments, so at
      least one segment of x survives VERBATIM inside y (pigeonhole).
    * PROBE side: that surviving segment appears in y at a start shifted
      from its position in x by delta, where the indels before it and
      after it bound |delta| + |(len(y)-len(x)) - delta| <= k — so for
      each candidate indexed length l in [m-k, m+k] and segment slot i,
      y emits the substrings at the (k - |m-l| + 1)-position window
      around the slot's start. Probe fan-out per doc is therefore
      sum_l (k+1)(k-|m-l|+1) ~ (k+1)^2 * (k+1) — a CONSTANT in corpus
      size (125 rows/doc at k=4), and candidates come from one
      equi-join on (l, slot, substring), never an all-pairs stage.
    * Candidate pairs dedupe BEFORE the DP (a pair can match on several
      slots), then the exact length band and Spark's banded early-exit
      levenshtein(threshold) verify, same as fuzzy_pairs.

    Strings shorter than k+1 cannot donate k+1 nonempty segments; they
    pair only with strings of length <= 2k (the length band), so the
    short stratum joins on a constant key — bounded for prose, and the
    exactness argument needs no pigeonhole there.

    Cost vs fuzzy_pairs: exact recall for a ~(k+1)x candidate fan-out
    (the documented PassJoin trade). k defaults to 4 (typo/OCR-level
    edits) rather than prefix blocking's 16: the probe window is
    O(k^3)/doc, so this is the right tool for adversarial small-k
    linkage while prefix blocking remains the cheap large-k screen."""
    from crdb_changefeed_publisher_spark.tables import fan_out_scan

    k = max_dist
    # Fan the doc scan out BEFORE the normalize + O(k^3) explodes: a
    # single-row-group corpus file otherwise pins the regexp normalize,
    # both segment explodes and the xxhash key build to ONE task
    # (measured at sf0.1: the probe explode alone was 1.7 s
    # single-threaded vs 0.9 s fanned out). No-op when the scan already
    # has >= defaultParallelism partitions (the 100 TB case).
    t = fan_out_scan(docs.select(id_col, text_col), id_col).select(
        F.col(id_col).alias("id"),
        normalized_link_key(F.col(text_col)).alias("t"),
    ).withColumn("len", F.length("t"))
    # One normalize pass, not four (r13): t feeds the index explode, the
    # probe explode, and both sides of the verify re-join — without a cut
    # each consumer re-runs the scan + regexp_replace normalize. Lazy
    # localCheckpoint: materialized by the first action (the saturation
    # guard when budgeted, else the pair job itself), reused by the rest.
    # ~(id + normalized text)/doc, the smallest frame in the pipeline —
    # cheaper to hold than the 125x/doc segment explodes already
    # checkpointed below.
    t = t.localCheckpoint(eager=False)

    long_t = t.filter(F.col("len") >= k + 1)
    short_t = t.filter(F.col("len") < k + 1)

    slot = F.col("slot")
    # index: k+1 segments per string, floor-boundary even partition
    idx = (
        long_t.select(
            F.col("id").alias("doc_i"),
            F.col("t").alias("ti"),
            F.col("len").alias("l"),
            F.explode(F.sequence(F.lit(0), F.lit(k))).alias("slot"),
        )
        .withColumn("s0", F.floor(slot * F.col("l") / (k + 1)).cast("int"))
        .withColumn("s1", F.floor((slot + 1) * F.col("l") / (k + 1)).cast("int"))
        # ids + an 8-byte key only past this point (the srp_lsh r1
        # ids-only lesson, twice over): carrying ti through the 5x slot
        # explode is pure bloat — the verify stage re-joins texts by id
        # on the DEDUPED pairs — and the raw seg substring (~len/(k+1)
        # chars) as the join key made the sf10 shuffle sort ~7 GB of
        # string keys (measured: the candidate join was 238 of 280 s).
        # xxhash64(l, slot, seg) folds the whole composite key into one
        # long; a hash collision can only ADD a candidate pair, and every
        # candidate is verified by the exact banded DP, so the answer is
        # unchanged — engine-native hashing is fine for keys that never
        # surface (the dedup_minhash_lsh precedent).
        .select(
            "doc_i",
            F.xxhash64(
                "l", "slot", F.expr("substring(ti, s0 + 1, s1 - s0)")
            ).alias("segk"),
        )
    )
    # probe: for each candidate indexed length l and slot, the delta
    # window of substrings. Integer-exact bounds: hi = (m-l+k) div 2
    # (non-negative, truncation = floor); lo = (m-l-k) div 2
    # (non-positive, truncation = ceil).
    probe = (
        t.filter(F.col("len") >= 1)  # sequence(start > stop) would descend
        .select(
            F.col("id").alias("doc_p"),
            F.col("t").alias("tp"),
            F.col("len").alias("m"),
            F.explode(
                F.sequence(
                    F.greatest(F.col("len") - k, F.lit(k + 1)),
                    F.col("len") + k,
                )
            ).alias("l"),
        )
        .filter(F.col("l") >= k + 1)
        .withColumn("slot", F.explode(F.sequence(F.lit(0), F.lit(k))))
        .withColumn("s0", F.floor(slot * F.col("l") / (k + 1)).cast("int"))
        .withColumn(
            "seg_len",
            (F.floor((slot + 1) * F.col("l") / (k + 1)) - F.col("s0")).cast("int"),
        )
        .withColumn(
            "delta",
            F.explode(
                F.sequence(
                    F.expr(f"div(m - l - {k}, 2)"), F.expr(f"div(m - l + {k}, 2)")
                )
            ),
        )
        .withColumn("p0", F.col("s0") + F.col("delta"))
        .filter((F.col("p0") >= 0) & (F.col("p0") <= F.col("m") - F.col("seg_len")))
        # ids + 8-byte key only (see idx): tp replicated through the
        # ~125x (l, slot, delta) fan-out dominated the join shuffle
        .select(
            "doc_p",
            F.xxhash64(
                "l", "slot", F.expr("substring(tp, p0 + 1, seg_len)")
            ).alias("segk"),
        )
    )
    if candidate_budget is not None:
        # measured saturation guard (r9 sf10: the fixture's 31-word
        # vocabulary saturates the (l, slot, seg) key space at 500k docs
        # — 24.5x/decade; see docs/SCALE.md 'Fifth decade')
        from crdb_changefeed_publisher_spark.operators.dedup import (
            block_candidate_guard_bipartite,
        )

        # the guard's count-aggs and the candidate join both consume the
        # full tokenize + O(k^3) explode + xxhash lineage of idx/probe;
        # without a cut they evaluate it twice (r9 ADVICE). Lazy
        # localCheckpoint: materialized by the guard, reused by the join.
        idx = idx.localCheckpoint(eager=False)
        probe = probe.localCheckpoint(eager=False)
        block_candidate_guard_bipartite(
            idx.select("segk"),
            probe.select("segk"),
            ["segk"],
            docs.count() if n_docs is None else n_docs,
            candidate_budget,
            "fuzzy_pairs_passjoin",
        )
    cand = (
        idx.join(probe, ["segk"])
        .filter(F.col("doc_i") != F.col("doc_p"))
        .select(
            F.least("doc_i", "doc_p").alias("doc_a"),
            F.greatest("doc_i", "doc_p").alias("doc_b"),
        )
    )
    # short stratum: strings under k+1 chars pair only within the length
    # band, i.e. with strings of length <= 2k — constant-key join over a
    # (for prose) tiny set, exactness needs no pigeonhole
    # EXPLICIT broadcast of the short side: without the hint this
    # inequality-only join is BNLJ only while a side fits the 10 MB
    # auto-broadcast estimate — one decade past that Spark silently
    # degrades it to a CartesianProduct over partition PAIRS, each pair
    # re-evaluating the normalize scan (measured at sf10: a ~0-row short
    # stratum cost 196 cartesian tasks and minutes of wall). The short
    # side is the bounded-for-prose side by construction (docstring).
    short_cand = (
        F.broadcast(
            short_t.select(F.col("id").alias("doc_a"), F.col("len").alias("la"))
        )
        .join(
            t.filter(F.col("len") <= 2 * k).select(
                F.col("id").alias("doc_b"), F.col("len").alias("lb")
            ),
            F.col("doc_a") != F.col("doc_b"),
        )
        .select(
            F.least("doc_a", "doc_b").alias("doc_a"),
            F.greatest("doc_a", "doc_b").alias("doc_b"),
        )
    )
    # One distinct over the unioned candidates, not three (r13): the
    # per-branch distincts each paid an exchange only for the union's
    # final distinct to re-shuffle the same (doc_a, doc_b) keys again.
    # Map-side partial aggregation still collapses the slot fan-out
    # before the single exchange, so shuffled bytes do not grow.
    both = cand.unionByName(short_cand).distinct()
    strs = t.select("id", "t", "len")
    return (
        both.join(
            strs.select(
                F.col("id").alias("doc_a"),
                F.col("t").alias("ta"),
                F.col("len").alias("la"),
            ),
            "doc_a",
        )
        .join(
            strs.select(
                F.col("id").alias("doc_b"),
                F.col("t").alias("tb"),
                F.col("len").alias("lb"),
            ),
            "doc_b",
        )
        .filter(F.abs(F.col("la") - F.col("lb")) <= k)
        .withColumn("dist", F.levenshtein("ta", "tb", k))
        .filter((F.col("dist") >= 0) & (F.col("dist") <= k))
        .select("doc_a", "doc_b", "dist")
    )
