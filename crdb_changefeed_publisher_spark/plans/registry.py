"""Query registry: name -> (Spark impl, DuckDB oracle SQL).

Contract (driver, see /root/repo/__spark_entry__.py): each Spark impl takes
``(spark, sf_dir)`` and returns a DataFrame; the oracle is equivalent SQL
DuckDB runs on the same parquet (views pre-registered per table name). The
driver compares row-count + schema + order-insensitive value hash, so:

- every computed column is aliased identically on both sides;
- float aggregates are rounded on both sides (cross-engine summation order
  differs in the last ulp; rounding makes the hash stable);
- top-k queries break ties deterministically (round first, then id).

Queries with ``oracle=None`` are genuinely non-SQL-expressible (streaming
state, LSH banding with engine-native hashing); the driver records a weaker
rows-only check for them.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str
    cost: float = 0.5  # rough sf0.1 wall seconds, used only for run ordering
    retired: bool = False  # kept + oracle-tested in pytest, not driver-registered


_REGISTRY: dict[str, QuerySpec] = {}

# Measured sf0.1 bench seconds (idle-machine min-of-2, post round-2
# rewrites; merged queries sum their parts). Queries not listed default to
# 0.5 s. Pure run-ordering metadata.
COST_HINTS: dict[str, float] = {
    "cdc_change_counts_by_table": 0.4,
    "asof_purchase_last_click_merge": 0.43,
    "customer_semi_anti": 0.45,
    "top_shingles_corpus": 0.45,
    "q3_shipping_priority": 0.47,
    "order_ship_latency": 0.49,
    "events_time_windows": 0.5,
    "nation_setops": 0.52,
    "embedding_topk_bruteforce": 0.51,
    "lang_id_confusion": 0.57,
    "q5_region_revenue": 0.59,
    "semi_structured_events": 0.68,
    "order_price_percentiles": 0.61,
    "doc_fingerprints": 0.96,
    "dedup_minhash_portable": 0.1,  # r6: pairs now a session-shared pass
    "dedup_ngram_jaccard": 1.75,  # r6 idle measure
    "dedup_simhash": 2.0,  # r8: degree aggregate, similar cost
    "source_scorecard": 1.0,  # r8 swap promotion
    "split_leakage_pairs": 0.5,  # r8 swap promotion (shared-pass consumer)
    "orders_matview_totals": 1.0,  # r9 swap promotion
    "order_price_quantile_sketch": 0.7,  # r9 swap promotion
    "doc_chunks": 0.6,
    "doc_decontamination": 1.0,
    "salted_skew_agg": 0.8,
    "doc_perplexity_proxy": 1.1,
    "embedding_topk_srp_lsh": 1.76,
    # r5: shared persisted encode pass + ADC/masked-GEMM scans — warm cost
    # is ~0.9/1.2 s, first run pays the one-time index build
    "embedding_topk_ivf": 1.0,
    "embedding_topk_ivfpq": 1.3,
    # r8 swap round 5: trained lifecycle; first run pays the shared kmeans
    # training pass (~2 s at sf0.1), probe+rerank is ~1 s warm
    "embedding_topk_ivf_trained": 2.5,
    "dedup_cluster_keep_list": 0.6,  # r6: consumes the shared pair pass
    # r5 additions: curation pays the one-time contamination pass that
    # doc_decontamination then reuses (session-persisted)
    "corpus_curation_report": 2.5,
    "multimodal_real_features": 0.6,
    "doc_repetition_signals": 2.0,
    # r6 registry-swap promotions (hints from prior retired-harness timings)
    "events_funnel": 0.6,
    "orders_quality_checks": 0.7,
    "dedup_incremental": 2.2,
    # r7 registry-swap promotions (hints from retired-harness timings)
    "doc_duplicate_spans": 1.5,
    "multimodal_near_dup": 1.1,
    # r8 registry-swap round 4 promotions (hints from retired-harness timings)
    "bloom_semijoin_stats": 0.9,
    "cdc_schema_evolution": 1.0,
    "doc_fuzzy_linkage": 0.8,
    # r10 swap round 7 promotions (hints from retired-harness timings)
    "doc_exact_substring_dedup": 2.0,
    "doc_dsir_sample": 1.2,
    # r10 swap round 8 promotion (sf0.1 measure in docs/SCALE.md)
    "doc_fuzzy_linkage_exact": 9.9,
    # r12 swap round 10 promotion: first run pays the two-level training
    # pass (~3.5 s at sf0.1, session-shared), probe+rerank ~1 s warm
    "embedding_topk_ivf_two_level": 4.5,
}


def query(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    cost: float | None = None,
    retired: bool = False,
):
    """Decorator registering a named query with its oracle SQL.

    `cost` is a coarse expected-runtime hint (seconds at sf0.1; defaults to
    COST_HINTS / 0.5). It does not change any result; it only orders
    `all_specs()`.

    `retired=True` keeps the implementation + oracle under pytest
    verification (tests/test_retired_oracle.py) but excludes it from the
    driver-facing `all_specs()`: the driver's CORRECTNESS gate records at
    most 50 queries per round, so the registry stays <= 50 by retiring
    redundant variants of operators whose primary form IS registered.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            doc=doc or (fn.__doc__ or ""),
            cost=COST_HINTS.get(name, 0.5) if cost is None else cost,
            retired=retired,
        )
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    """Driver-registered queries (retired excluded), CHEAPEST FIRST.

    The driver records a CORRECTNESS row for at most 50 queries per round
    (observed hard cap in rounds 1-2); keeping this dict <= 50 entries means
    EVERY registered operator gets a driver-verified row. Cheapest-first
    ordering additionally front-loads signal if a time budget intervenes.
    """
    return dict(
        sorted(
            ((k, v) for k, v in _REGISTRY.items() if not v.retired),
            key=lambda kv: (kv[1].cost, kv[0]),
        )
    )


def retired_specs() -> dict[str, QuerySpec]:
    """Retired variants: still implemented and oracle-tested in pytest."""
    return dict(sorted((k, v) for k, v in _REGISTRY.items() if v.retired))


def get_spec(name: str) -> QuerySpec:
    return _REGISTRY[name]
