"""Span/edit-truth specs (r11 verdict #4): ExactSubstr and PassJoin
value-verified on the realistic span/edit fixture — the corpus where
their guarantees are also certified against PLANTED ground truth
(fixtures.build_spanedit_corpus; floors in tests/test_spanedit_fixture.py
at the 50k tier).

Both specs run at the 2.5k tier: the DuckDB twins are full pipelines
(positional-gram coverage window; exhaustive blocking-free edit-distance
DP — the DP's bucket pairs grow ~n^2, 200 s at 5k docs), so the spec
tier is sized for the retired-oracle harness while the truth floors run
the production-fan-out 50k tier in pytest. Like the realism specs,
sf_dir is deliberately ignored — the fixture IS the tier.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from crdb_changefeed_publisher_spark import fixtures
from crdb_changefeed_publisher_spark.plans.registry import query

SPANEDIT_N = 2500

# deterministic tier path, embedded in oracle SQL at import time WITHOUT
# building (the Spark side runs first in every harness and lazily builds
# via ensure_spanedit_tier; import must stay cheap)
SPANEDIT_DIR = os.path.join(fixtures.REALCORPUS_ROOT, f"se{SPANEDIT_N}")


def _spans_docs(spark: SparkSession) -> DataFrame:
    return spark.read.parquet(
        os.path.join(
            fixtures.ensure_spanedit_tier(SPANEDIT_N),
            "documents_spans.parquet",
        )
    )


def _edits_docs(spark: SparkSession) -> DataFrame:
    return spark.read.parquet(
        os.path.join(
            fixtures.ensure_spanedit_tier(SPANEDIT_N),
            "documents_edits.parquet",
        )
    )


def _exsub_oracle_on_tier() -> str:
    """The registered ExactSubstr twin (llm._EXSUB_ORACLE), re-pointed at
    the span tier's parquet — same gram/coverage/rebuild SQL, different
    source relation."""
    from crdb_changefeed_publisher_spark.plans import llm

    return llm._EXSUB_ORACLE.replace(
        "FROM documents",
        f"FROM read_parquet('{SPANEDIT_DIR}/documents_spans.parquet')",
    )


@query(
    "spanedit_exact_substring",
    retired=True,  # truth floors live in tests/test_spanedit_fixture.py;
    # this row value-verifies the same operator vs DuckDB on the fixture
    oracle=_exsub_oracle_on_tier(),
    doc="ExactSubstr excision on the span-truth realism tier: documents "
    "with planted verbatim shared runs (guard-flanked, known word "
    "boundaries) rewritten with every duplicated >=8-gram span excised. "
    "The DuckDB twin proves engine-equality on this corpus; the planted "
    "truth (tests/test_spanedit_fixture.py) proves the excision is "
    "EXACTLY the planted coverage — count and kept_text both — at the "
    "50k tier (operators/text.py::exact_substring_excise).",
)
def spanedit_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crdb_changefeed_publisher_spark.operators.text import (
        exact_substring_excise,
    )

    return exact_substring_excise(_spans_docs(spark), n=8, min_count=2)


@query(
    "spanedit_passjoin_pairs",
    retired=True,  # truth floors live in tests/test_spanedit_fixture.py
    oracle=f"""
    WITH d AS MATERIALIZED (
        SELECT doc_id, t, length(t) AS len,
               [{", ".join(f"length(t) - length(replace(t, '{c}', ''))"
                           for c in "abcdefghijklmnopqrstuvwxyz ")}] AS hist
        FROM (SELECT doc_id,
                     lower(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS t
              FROM read_parquet('{SPANEDIT_DIR}/documents_edits.parquet'))
    ), ka AS MATERIALIZED (
        SELECT doc_id, t, len, hist, len // 5 AS bkt FROM d
    ), kb AS MATERIALIZED (
        SELECT doc_id, t, len, hist,
               unnest([len // 5 - 1, len // 5, len // 5 + 1]) AS bkt
        FROM d
    )
    -- exhaustive over everything ed <= 4 admits: both prefilters are
    -- THEOREMS (ed >= |len diff| as a lossless bucket equi-join;
    -- ed >= L1(char hist)/2), never blocking — the
    -- doc_fuzzy_linkage_exact oracle discipline
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           levenshtein(a.t, b.t) AS dist
    FROM ka a JOIN kb b ON a.bkt = b.bkt AND a.doc_id < b.doc_id
    WHERE abs(a.len - b.len) <= 4
      AND list_sum(list_transform(range(1, 28),
                   i -> abs(a.hist[i] - b.hist[i]))) <= 8
      AND levenshtein(a.t, b.t) <= 4
    """,
    doc="PassJoin exact-recall pairs (ed <= 4) on the edit-truth realism "
    "tier: character-mutation clones planted at known edit distances. "
    "The blocking-free DuckDB twin proves engine-equality; the planted "
    "truth (tests/test_spanedit_fixture.py) pins recall == 1.0 AND "
    "output == planted set at the 50k tier "
    "(operators/linkage.py::fuzzy_pairs_passjoin, Li/Deng/Feng PVLDB'11).",
)
def spanedit_passjoin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crdb_changefeed_publisher_spark.operators.linkage import (
        fuzzy_pairs_passjoin,
    )

    return fuzzy_pairs_passjoin(_edits_docs(spark), max_dist=4)
