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


_REGISTRY: dict[str, QuerySpec] = {}

# Measured sf0.1 bench seconds (idle-machine min-of-2, post round-2
# rewrites). Queries not listed default to 0.5 s. Pure run-ordering
# metadata.
COST_HINTS: dict[str, float] = {
    "cdc_change_counts_by_table": 0.4,
    "asof_purchase_last_click_merge": 0.43,
    "best_order_per_customer": 0.43,
    "top_shingles_corpus": 0.45,
    "q3_shipping_priority": 0.47,
    "order_ship_latency": 0.49,
    "embedding_topk_bruteforce": 0.51,
    "lang_id_confusion": 0.57,
    "q5_region_revenue": 0.59,
    "order_price_percentiles": 0.61,
    "asof_purchase_last_click": 0.62,
    "doc_fingerprints": 0.96,
    "dedup_minhash_portable": 1.13,
    "dedup_minhash_lsh": 1.19,
    "dedup_ngram_jaccard": 1.32,
    "dedup_simhash": 1.39,
    "doc_chunks": 0.6,
    "salted_skew_agg": 0.8,
    "doc_perplexity_proxy": 1.1,
    "embedding_topk_srp_lsh": 1.76,
    "embedding_topk_ivf": 1.89,
    "embedding_topk_pq": 2.0,
    "embedding_topk_ivfpq": 2.2,
    "dedup_cluster_keep_list": 1.8,
}


def query(name: str, oracle: str | None = None, doc: str = "", cost: float | None = None):
    """Decorator registering a named query with its oracle SQL.

    `cost` is a coarse expected-runtime hint (seconds at sf0.1; defaults to
    COST_HINTS / 0.5). It does not change any result; it only orders
    `all_specs()`.
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
        )
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    """All registered queries, CHEAPEST FIRST (cost hint, then name).

    The driver iterates this dict in order under a global time budget; in
    round 1 the 12 most-expensively-placed queries got no CORRECTNESS row
    because the budget expired mid-list. Cheapest-first maximizes the number
    of queries that get a recorded correctness signal whatever the budget.
    """
    return dict(sorted(_REGISTRY.items(), key=lambda kv: (kv[1].cost, kv[0])))


def get_spec(name: str) -> QuerySpec:
    return _REGISTRY[name]
