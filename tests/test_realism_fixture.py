"""Standing realism-corpus verification (r10 verdict #2): the 500k-doc
Zipfian tier with planted truth pairs is the only data where near-dup
RECALL is measurable against ground truth. The retired/registered specs
value-verify the pair and degree outputs against DuckDB twins
(plans/realism.py); this module pins the recall contract itself.

Measured baseline (docs/near_dup_realism_r10.json): banded 16-hash/4-band
MinHash recall 0.89, FLAT across three decades (5k/50k/500k). The floor
here is 0.85 — above the 2-band family's ~0.65 theoretical ceiling at the
planted j~0.8 (so a silent band-shape regression trips it) and below the
measured value by a noise margin.
"""

from __future__ import annotations

import pytest

from crdb_changefeed_publisher_spark.plans import realism


@pytest.fixture(scope="module")
def pairs(spark):
    # session-shared: the same persisted pair table the registered degree
    # row and the retired pair row consume
    return realism.realism_pairs(spark)


def test_planted_recall_floor(spark, pairs):
    truth = realism.truth_pairs(spark)
    n_truth = truth.count()
    assert n_truth > 50_000  # the 500k tier plants ~81.6k pairs
    found = pairs.join(truth, ["doc_a", "doc_b"], "leftsemi").count()
    recall = found / n_truth
    assert recall >= 0.85, (
        f"banded recall {recall:.4f} fell below the pinned 0.85 floor "
        f"({found}/{n_truth} planted pairs found) — the 16-hash/4-band "
        "portable family measured 0.89 flat across decades"
    )


def test_degrees_consistent_with_pairs(spark, pairs):
    from crdb_changefeed_publisher_spark.operators import dedup

    deg = dedup.minhash_portable_degrees(None, pairs=pairs)
    n_docs_with_nbrs = deg.count()
    n_endpoints = (
        pairs.select("doc_a").union(pairs.select("doc_b")).distinct().count()
    )
    assert n_docs_with_nbrs == n_endpoints
    # degree mass = 2 x pair count (every pair contributes two endpoints)
    from pyspark.sql import functions as F

    total_deg = deg.agg(F.sum("n_near_dups")).first()[0]
    assert total_deg == 2 * pairs.count()


def test_tier_is_deterministic_fingerprint(spark):
    """The standing fixture must be the exact corpus the committed oracles
    were verified on: pin a cheap whole-corpus fingerprint (row count +
    xxhash64 fold of (doc_id, text)). If this trips, the tier directory
    was built by a different generator version — delete it and rebuild."""
    from pyspark.sql import functions as F

    docs = realism._docs(spark)
    row = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("doc_id", "text") % 1_000_000_007).alias("fp"),
    ).first()
    assert row.n == realism.REALISM_N
    assert row.fp == -126250512661, f"corpus fingerprint drifted: {row.fp}"


def _pairs_key(rows):
    return sorted((r.doc_a, r.doc_b, r.est_jaccard) for r in rows)


def test_pairs_cache_materializes_and_reads_back(spark, monkeypatch):
    """The pair table is a pure function of (corpus fingerprint, family
    dials), so it persists to parquet beside the tier (r11 verdict #3) and
    later sessions READ it instead of paying the 4-band build. Driven on
    the 5k tier: first call writes the _SUCCESS-marked cache dir; with the
    session dict cleared and the builder monkeypatched to explode, the
    next call must succeed purely from disk — and byte-identically."""
    import os

    from crdb_changefeed_publisher_spark.operators import dedup

    first = _pairs_key(realism.realism_pairs(spark, n_docs=5000).collect())
    tier = realism.fixtures.ensure_tier(5000)
    docs = spark.read.parquet(os.path.join(tier, "documents.parquet"))
    n, fp = realism._corpus_fingerprint(docs)
    path = realism._pairs_cache_path(tier, n, fp)
    assert realism._pairs_cache_trusted(path), path

    realism._REALISM_PAIRS_CACHE.clear()

    def boom(*a, **k):  # the read-back path must never rebuild
        raise AssertionError("cache miss: pair table was rebuilt")

    monkeypatch.setattr(dedup, "minhash_portable_pairs", boom)
    again = _pairs_key(realism.realism_pairs(spark, n_docs=5000).collect())
    assert again == first


def test_incremental_shard_admission_certified_at_realism_tier(spark):
    """r12 verdict #4: the incremental ingest path certified against
    PLANTED cross-shard truth at the realism tier. A deterministic 50k
    shard (fixtures.build_shard_corpus: 10% verbatim copies of tier docs,
    15% SUBST_P clones of tier base docs — the tier's own edit model, so
    its banded-recall floor transfers — 5% within-shard duplicates, rest
    fresh Zipfian text) is admitted against the 500k tier by probing the
    tier's PERSISTED content/band indexes (realism_corpus_index — the
    materialized-table discipline the pair cache established), under the
    same 16-hash/4-band family the registered realism row runs.

    Pins (measured r13: exact 4979/4979, near recall 0.898, new precision
    0.990 — the ~1% band collisions on fresh text are the honest LSH
    candidate-screen load):
      * every planted verbatim copy classifies 'exact' (sha2 equality is
        deterministic — recall exactly 1.0, zero tolerance);
      * planted-clone recall >= 0.85 (the tier's standing floor);
      * fresh-doc 'new' precision >= 0.97;
      * within-shard keep/n_copies accounting equals an independent
        text-grouping recomputation;
      * the 500k corpus is NEVER READ: the report's input files are the
        two index tables + the shard only (zero corpus scan, a fortiori
        zero corpus shuffle — the 100 TB ingest posture)."""
    import os

    from pyspark.sql import functions as F

    from crdb_changefeed_publisher_spark import fixtures
    from crdb_changefeed_publisher_spark.operators import dedup

    shard_dir = fixtures.ensure_shard_tier(50_000, realism.REALISM_N)
    keys, bands = realism.realism_corpus_index(spark)
    shard = spark.read.parquet(
        os.path.join(shard_dir, "shard_documents.parquet")
    )
    truth = spark.read.parquet(os.path.join(shard_dir, "truth_shard.parquet"))

    rep = dedup.incremental_dedup_report(
        None, shard,
        coeffs=dedup.PORTABLE_COEFFS16, bands=4,
        corpus_keys=keys, corpus_bands=bands,
    )

    # the corpus is never read: only the persisted indexes + the shard
    tier_docs = os.path.join(
        fixtures.ensure_tier(realism.REALISM_N), "documents.parquet"
    )
    files = rep.inputFiles()
    assert files and not any(tier_docs in f for f in files), files[:3]
    assert any("keys_" in f for f in files)
    assert any("bands_" in f for f in files)
    assert any("shard_documents.parquet" in f for f in files)

    cls = {
        (r.expected, r.vs_corpus): r.n
        for r in rep.join(
            truth.select(F.col("doc_id").alias("keep_id"), "expected"),
            "keep_id",
        )
        .groupBy("expected", "vs_corpus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    def total(expected):
        return sum(n for (e, _), n in cls.items() if e == expected)

    assert cls.get(("exact", "near"), 0) == 0
    assert cls.get(("exact", "new"), 0) == 0
    assert cls.get(("exact", "exact"), 0) == total("exact") > 4_000

    near_recall = cls.get(("near", "near"), 0) / total("near")
    assert near_recall >= 0.85, f"cross-shard clone recall {near_recall:.4f}"
    # a planted clone must never hash-equal its parent (>= 1 edit forced)
    assert cls.get(("near", "exact"), 0) == 0

    new_precision = cls.get(("new", "new"), 0) / total("new")
    assert new_precision >= 0.97, f"fresh-doc precision {new_precision:.4f}"

    # within-shard keep/n_copies accounting == independent text grouping
    want_keeps = {
        (r.keep_id, r.n_copies)
        for r in shard.groupBy("text")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .collect()
    }
    got_keeps = {(r.keep_id, r.n_copies) for r in rep.collect()}
    assert got_keeps == want_keeps
    # the planted intra-shard duplicates are really exercised
    assert sum(c for _, c in want_keeps if c > 1) > 2_000


def test_pairs_cache_stale_without_success_marker(spark):
    """A cache dir without its _SUCCESS marker (crashed write) is not
    trusted: the pair table rebuilds and re-lands trusted. A regenerated
    CORPUS never even reaches this check — its new fingerprint selects a
    different directory, structurally orphaning the stale table."""
    import os
    import shutil

    tier = realism.fixtures.ensure_tier(5000)
    docs = spark.read.parquet(os.path.join(tier, "documents.parquet"))
    n, fp = realism._corpus_fingerprint(docs)
    path = realism._pairs_cache_path(tier, n, fp)
    before = _pairs_key(realism.realism_pairs(spark, n_docs=5000).collect())

    os.remove(os.path.join(path, "_SUCCESS"))
    assert not realism._pairs_cache_trusted(path)
    realism._REALISM_PAIRS_CACHE.clear()
    rebuilt = _pairs_key(realism.realism_pairs(spark, n_docs=5000).collect())
    assert realism._pairs_cache_trusted(path)
    assert rebuilt == before

    # wrong-fingerprint dirs are never selected
    assert realism._pairs_cache_path(tier, n, fp + 1) != path
    shutil.rmtree(f"{path}.tmp-{spark.sparkContext.applicationId}",
                  ignore_errors=True)
