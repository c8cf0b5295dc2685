"""End-to-end corpus curation: the composition a training-data pipeline
actually runs over the documents table, built entirely from the registered
operator families:

    exact-dedup -> benchmark decontamination -> quality gate -> stratified
    language rebalancing

Each stage is a registered, oracle-verified operator (or the exact same
column expressions); this module wires them into one DataFrame plan so the
whole sweep runs as a single Spark job — Catalyst sees every filter at
once, and the (big) text column is scanned exactly once.

Scale shape: one partial-agg shuffle for the dedup keep-list, one broadcast
join for the benchmark n-gram set, everything else per-row — the same
per-stage postures documented in docs/SCALE.md. Every gate is DETERMINISTIC
(hash/mod arithmetic, no rand()), so a re-run over the same snapshot
produces the same corpus — the property that makes 100 TB curation runs
resumable and auditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crdb_changefeed_publisher_spark.operators.text import (
    benchmark_contamination,
    quality_score,
    word_count,
)

# Deterministic per-language sampling quotas out of 10 (language REBALANCING:
# the fixture corpus is ~44% English; downsampling the dominant language is
# the standard curation move). doc_id % 10 < quota keeps the decision
# portable, reproducible, and joinable — no rand() seeds to track.
DEFAULT_LANG_QUOTAS: dict[str, int] = {"en": 5}
DEFAULT_QUOTA = 10  # non-listed languages keep everything


def curate_corpus(
    docs: DataFrame,
    contamination_max: float = 0.05,
    quality_min: float = 0.2,
    lang_quotas: dict[str, int] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    contamination: DataFrame | None = None,
) -> DataFrame:
    """Return the curated corpus: one row per KEPT document plus the gate
    columns (is_canonical, contamination, quality, sampled) so an audit can
    reconstruct every decision. Drop reasons compose independently — a doc
    must pass ALL gates.

    `contamination`: optionally a precomputed `benchmark_contamination`
    output for these docs (must carry doc_id + contamination) — the
    corpus-wide 8-gram pass is the expensive stage, and a production run
    computes it once per corpus snapshot and feeds every consumer
    (plans/llm.py persists one per session/sf_dir, shared with the
    standalone doc_decontamination query)."""
    quotas = DEFAULT_LANG_QUOTAS if lang_quotas is None else lang_quotas

    # gate 1: exact dedup — canonical copy = min doc_id per exact text.
    # Grouped/joined on sha2-256 of the text (32 B shuffle + broadcastable
    # key frame instead of moving the corpus text twice; same collision
    # contract as operators/dedup.py::exact_duplicates)
    text_key = F.sha2(F.col(text_col), 256)
    canon = docs.groupBy(text_key.alias("_tkey")).agg(F.min(id_col).alias("_canon_id"))
    with_canon = (
        docs.withColumn("_tkey", text_key)
        .join(canon, "_tkey")
        .withColumn("is_canonical", F.col(id_col) == F.col("_canon_id"))
        .drop("_tkey")
    )

    # gate 2: benchmark decontamination (broadcast n-gram set; docs too
    # short for any 8-gram cannot be contaminated -> contamination 0)
    if contamination is None:
        contamination = benchmark_contamination(docs, text_col=text_col, id_col=id_col)
    contam = contamination.select(F.col("doc_id").alias(id_col), "contamination")
    with_contam = with_canon.join(contam, id_col, "left").withColumn(
        "contamination", F.coalesce(F.col("contamination"), F.lit(0.0))
    )

    # gate 3: quality score (portable arithmetic, per-row)
    with_quality = with_contam.withColumn("quality", F.round(quality_score(F.col(text_col)), 4))

    # gate 4: deterministic stratified sampling by language
    quota_expr = F.lit(DEFAULT_QUOTA)
    for lang, q in sorted(quotas.items()):
        quota_expr = F.when(F.col(lang_col) == lang, F.lit(q)).otherwise(quota_expr)
    sampled = with_quality.withColumn("sampled", (F.col(id_col) % 10) < quota_expr)

    return (
        sampled.filter(
            F.col("is_canonical")
            & (F.col("contamination") <= contamination_max)
            & (F.col("quality") >= quality_min)
            & F.col("sampled")
        )
        .drop("_canon_id")
        .withColumn("n_tokens", word_count(F.col(text_col)))
    )


def mixture_weights(
    docs: DataFrame,
    alpha: float = 0.5,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled DOMAIN MIXTURE weights — the multilingual/
    multi-domain rebalancing rule used by LLM pretraining pipelines
    (sample domain d with probability proportional to (token share)^alpha;
    alpha < 1 upsamples the tail, alpha = 1 keeps the natural mix).

    Input: the corpus; output: one row per domain (here: language) with
    its token mass, natural share, temperature-scaled target share, and
    the per-document sampling RATE that realizes the target from the
    natural distribution (rate capped at 1 — no upsampling duplication;
    renormalized shares so the target is a distribution).

    All arithmetic is deterministic aggregates over one partial-agg
    shuffle + a broadcast 1-row total — oracle-expressible end to end.
    At 100 TB: domains are few, the heavy input is the token count,
    which is the same single text scan every other curation gate shares.
    """
    toks = docs.groupBy(lang_col).agg(
        F.sum(word_count(F.col(text_col)).cast("long")).alias("domain_tokens")
    )
    total = toks.agg(F.sum("domain_tokens").alias("_total"))
    scaled = (
        toks.crossJoin(F.broadcast(total))
        .withColumn("natural_share", F.col("domain_tokens") / F.col("_total"))
        .withColumn("_scaled", F.pow(F.col("natural_share"), F.lit(alpha)))
    )
    z = scaled.agg(F.sum("_scaled").alias("_z"))
    return (
        scaled.crossJoin(F.broadcast(z))
        .withColumn("target_share", F.col("_scaled") / F.col("_z"))
        .withColumn(
            "sample_rate",
            F.least(F.lit(1.0), F.col("target_share") / F.col("natural_share")),
        )
        .select(
            lang_col,
            "domain_tokens",
            F.round("natural_share", 6).alias("natural_share"),
            F.round("target_share", 6).alias("target_share"),
            F.round("sample_rate", 6).alias("sample_rate"),
        )
    )


def curation_report(docs: DataFrame, curated: DataFrame, lang_col: str = "lang") -> DataFrame:
    """Per-language before/after counts + kept token mass — the summary a
    curation run publishes alongside the output dataset."""
    before = docs.groupBy(lang_col).agg(F.count(F.lit(1)).alias("n_docs_in"))
    after = curated.groupBy(lang_col).agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tokens").alias("tokens_kept"),
    )
    return (
        before.join(after, lang_col, "left")
        .na.fill({"n_docs_kept": 0, "tokens_kept": 0})
        .withColumn(
            "keep_rate", F.round(F.col("n_docs_kept") / F.col("n_docs_in"), 4)
        )
    )
