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
edit inside the first 24 chars escapes the block; the PassJoin upgrade —
block on each of k+1 fixed segments instead of one prefix — buys exact
recall for (k+1)x candidate fan-out. See also the saturation guard pattern
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
    ends = pairs.select(
        F.col("doc_a").alias("doc_id"), F.col("doc_b").alias("nbr"), "dist"
    ).unionByName(
        pairs.select(F.col("doc_b").alias("doc_id"), F.col("doc_a").alias("nbr"), "dist")
    )
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
