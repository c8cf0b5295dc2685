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


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator registering a named query with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    return dict(_REGISTRY)


def get_spec(name: str) -> QuerySpec:
    return _REGISTRY[name]
