"""Span/edit-truth certification (r11 verdict #4): the realism corpus
certifies candidate recall for set-similarity (MinHash) only; this file
pins the other two dedup guarantees against PLANTED ground truth on
realistic Zipfian data (fixtures.build_spanedit_corpus):

* ExactSubstr EXCISION-EXACTNESS — verbatim shared runs with known word
  boundaries, guard-flanked so expected coverage is exactly the planted
  span: the operator's (n_removed_words, kept_text) must MATCH truth on
  every planted doc and remove nothing anywhere else.
* PassJoin EXACT RECALL — character-mutation clones at ed <= 4: the
  operator's guarantee is exactness, so the floor is recall 1.0 (and on
  this corpus, where unrelated docs sit hundreds of edits apart, the
  output pair set must EQUAL the planted set).

Tier: 50k docs per table — PassJoin's k=4 probe window is O(k^3)/doc, so
50k exercises the production fan-out while the exhaustive claims stay
testable (r11 verdict: "50k is plenty for PassJoin's k=4 regime").
"""

from __future__ import annotations

import os

import pytest

from crdb_changefeed_publisher_spark import fixtures

TIER_N = 50_000


@pytest.fixture(scope="module")
def tier_dir():
    return fixtures.ensure_spanedit_tier(TIER_N)


def test_spanedit_build_is_deterministic(tmp_path):
    """Two builds of the same tier must be byte-identical (the standing-
    fixture property: a fresh checkout reproduces the corpus the
    committed floors were verified on)."""
    a = tmp_path / "a"
    b = tmp_path / "b"
    sa = fixtures.build_spanedit_corpus(2000, str(a))
    sb = fixtures.build_spanedit_corpus(2000, str(b))
    assert sa == sb
    for f in sorted(os.listdir(a)):
        with open(a / f, "rb") as fa, open(b / f, "rb") as fb:
            assert fa.read() == fb.read(), f"{f} differs between builds"


def test_excision_exactness_on_planted_spans(spark, tier_dir):
    """exact_substring_excise must remove EXACTLY the planted coverage:
    every planted doc loses precisely its span (count and kept_text both
    truth-equal), every unplanted doc loses nothing. This is the
    exactness contract no engine-vs-engine twin can certify — the twin
    proves both engines compute the same thing, the planted truth proves
    it is the RIGHT thing."""
    from pyspark.sql import functions as F

    from crdb_changefeed_publisher_spark.operators.text import (
        exact_substring_excise,
    )

    docs = spark.read.parquet(
        os.path.join(tier_dir, "documents_spans.parquet")
    )
    truth = spark.read.parquet(os.path.join(tier_dir, "truth_spans.parquet"))
    n_truth = truth.count()
    assert n_truth > 4_000  # ~12% of 50k in groups of 2-3

    out = exact_substring_excise(docs, n=8, min_count=2)
    joined = out.join(
        truth.select(
            "doc_id",
            F.col("span_len").alias("t_len"),
            F.col("kept_text").alias("t_kept"),
        ),
        "doc_id",
        "left",
    )
    bad = joined.filter(
        (
            F.col("t_len").isNotNull()
            & (
                (F.col("n_removed_words") != F.col("t_len").cast("long"))
                | (F.col("kept_text") != F.col("t_kept"))
            )
        )
        | (F.col("t_len").isNull() & (F.col("n_removed_words") != 0))
    )
    n_bad = bad.count()
    assert n_bad == 0, (
        f"{n_bad} docs diverge from planted excision truth; sample: "
        f"{bad.select('doc_id', 'n_removed_words', 't_len').take(5)}"
    )
    assert out.count() == TIER_N


def test_passjoin_exact_recall_on_edit_clones(spark, tier_dir):
    """fuzzy_pairs_passjoin(max_dist=4) claims EXACT recall; on planted
    character-mutation clones the output pair set must equal the truth
    set — a miss breaks the pigeonhole guarantee, an extra means two
    'unrelated' 60-180-word docs sit within 4 edits (impossible by
    construction)."""
    from crdb_changefeed_publisher_spark.operators.linkage import (
        fuzzy_pairs_passjoin,
    )

    docs = spark.read.parquet(
        os.path.join(tier_dir, "documents_edits.parquet")
    )
    truth = spark.read.parquet(
        os.path.join(tier_dir, "truth_edit_pairs.parquet")
    )
    t = sorted((r.doc_a, r.doc_b) for r in truth.collect())
    assert len(t) == int(TIER_N * fixtures.EDIT_CLONE_FRAC)

    pairs = fuzzy_pairs_passjoin(docs, max_dist=4, n_docs=TIER_N)
    got = sorted((r.doc_a, r.doc_b) for r in pairs.collect())
    missed = set(t) - set(got)
    extra = set(got) - set(t)
    assert not missed, f"PassJoin missed {len(missed)} planted pairs: {sorted(missed)[:5]}"
    assert not extra, f"unplanted pairs within ed<=4: {sorted(extra)[:5]}"
