"""Data profiling and quality checks — the observability layer a 100 TB
pipeline runs before trusting a table (the Deequ/Great-Expectations
operator family, expressed as plain Spark aggregations).

Shapes:
- `profile_table` is ONE aggregation job over the scan: every per-column
  metric (count, nulls, distinct, min/max) is an agg expression in a single
  groupBy-less agg, so Spark computes the whole profile in one pass with
  partial aggregation — profiling cost ~ one full scan, never per-column
  scans. Exact distincts shuffle (that is their contract); swap in
  approx_count_distinct when estimates suffice.
- `quality_checks` emits one row per declared constraint with its exact
  violation count. Row-local predicates (non-null, range, enum) fold into
  the same one-pass agg; cross-table containment is a broadcast anti-join
  count; uniqueness is a groupBy-count filter. Every check is a count —
  the output is auditable and diffable across runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str]) -> DataFrame:
    """Long-format profile: one row per (column, metric) with the value
    cast to string (uniform schema across numeric/string/timestamp
    columns). Metrics: n_rows, n_null, n_distinct (exact, null excluded),
    min, max. Doubles render rounded to 4 so the string form is
    cross-engine stable."""

    def render(c: str, expr) -> F.Column:
        dt = dict(df.dtypes)[c]
        if dt == "double":
            return F.round(expr, 4).cast("string")
        if dt == "timestamp":
            return F.date_format(expr, "yyyy-MM-dd HH:mm:ss")
        return expr.cast("string")

    # Aggregate outputs get POSITIONAL aliases (m0, m1, ...) — raw column
    # names never enter a parsed SQL string or an alias, so names containing
    # quotes/backticks/dots cannot break or inject anything (ADVICE r5); the
    # (column, metric) labels re-enter as typed literals below.
    metrics = ("n_rows", "n_null", "n_distinct", "min", "max")
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)),
            F.countDistinct(c),
            render(c, F.min(c)),
            render(c, F.max(c)),
        ]
    wide = df.agg(*[a.alias(f"m{i}") for i, a in enumerate(aggs)])
    # unpivot the single wide row into (column, metric, value) — explode of
    # a literal struct array over the 1-row aggregate, cost-free
    entries = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.lit(m).alias("metric"),
            F.col(f"m{i * len(metrics) + j}").cast("string").alias("value"),
        )
        for i, c in enumerate(cols)
        for j, m in enumerate(metrics)
    ]
    return wide.select(F.explode(F.array(*entries)).alias("p")).select("p.*")


def quality_checks(
    df: DataFrame,
    unique_cols: list[str] | None = None,
    not_null_cols: list[str] | None = None,
    enum_domains: dict[str, list[str]] | None = None,
    non_negative_cols: list[str] | None = None,
    contained_in: dict[str, tuple[DataFrame, str]] | None = None,
) -> DataFrame:
    """One row per constraint: (check, violations, total, passed).

    Row-local families (not_null / enum / non_negative) share ONE
    aggregation pass; uniqueness counts rows beyond the first per key;
    containment counts orphans via a broadcast-able left-anti join against
    the (distinct) parent keys.

    `total` is computed INSIDE the row-local aggregation pass (r13: the
    former eager df.count() was both a separate scan/job and a documented
    consistency hazard on non-static sources — the local-family rows now
    read total from the very pass that counted their violations) and
    reaches the unique/containment rows as a broadcast one-row join.
    """
    if not any((unique_cols, not_null_cols, enum_domains, non_negative_cols, contained_in)):
        raise ValueError("quality_checks: no constraints declared")
    rows: list[DataFrame] = []

    local_aggs = []
    local_names = []
    for c in not_null_cols or []:
        local_names.append(f"not_null:{c}")
        local_aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)))
    for c, dom in (enum_domains or {}).items():
        local_names.append(f"enum:{c}")
        local_aggs.append(F.sum(F.when(~F.col(c).isin(dom), 1).otherwise(0)))
    for c in non_negative_cols or []:
        local_names.append(f"non_negative:{c}")
        local_aggs.append(F.sum(F.when(F.col(c) < 0, 1).otherwise(0)))
    # ONE row after the aggregation — localCheckpoint cuts its lineage so
    # the per-constraint output branches (and every broadcast of the total)
    # read the materialized row instead of re-running the scan+agg subtree
    # per branch (measured: without the cut the plan re-scanned the input
    # once per broadcast build).
    wide = df.agg(
        F.count(F.lit(1)).alias("_total"),
        *[F.coalesce(a, F.lit(0)).alias(f"v{i}") for i, a in enumerate(local_aggs)],
    ).localCheckpoint(eager=False)
    total_row = wide.select(F.col("_total").alias("_t"))

    def check_row(name: str, violations) -> DataFrame:
        return violations.crossJoin(F.broadcast(total_row)).select(
            F.lit(name).alias("check"),
            F.col("v").cast("long").alias("violations"),
            F.col("_t").cast("long").alias("total"),
            (F.col("v") == 0).alias("passed"),
        )

    for i, name in enumerate(local_names):
        rows.append(check_row(name, wide.select(F.col(f"v{i}").alias("v"))))
    for c in unique_cols or []:
        dup = (
            df.groupBy(c)
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(F.coalesce(F.sum(F.col("_n") - 1), F.lit(0)).alias("v"))
        )
        rows.append(check_row(f"unique:{c}", dup))
    for c, (parent, parent_col) in (contained_in or {}).items():
        orphans = (
            df.select(F.col(c).alias("_k"))
            .join(
                F.broadcast(parent.select(F.col(parent_col).alias("_k")).distinct()),
                "_k",
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("v"))
        )
        rows.append(check_row(f"contained:{c}", orphans))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def distribution_drift_report(
    baseline: DataFrame,
    current: DataFrame,
    dim_col: str,
    smoothing: float = 0.5,
) -> DataFrame:
    """Categorical distribution drift between two table snapshots over one
    dimension — the monitor a training-data pipeline runs per ingest to
    catch composition shifts (language mix collapsing, a source flooding
    the corpus) before they reach a training run.

    One row per dimension value present in EITHER snapshot: counts, the
    two shares, and the value's Population-Stability-Index contribution
    psi = (p_cur - p_base) * ln(p_cur / p_base); sum(psi) is the standard
    PSI statistic (rule of thumb: < 0.1 stable, > 0.25 action). Additive
    smoothing keeps values absent from one side finite and makes the
    report total-order stable.

    Shape at 100 TB: each snapshot reduces with ONE partial-agg count
    shuffle to ~cardinality(dim) rows; the join and the two total rows are
    broadcasts. Nothing downstream of the first aggregates is data-sized.
    All floats rounded to 6 — the report is engine-exact and diffable
    across runs (the DuckDB oracle reproduces every row)."""
    base_counts = baseline.groupBy(F.col(dim_col).alias("dim")).agg(
        F.count(F.lit(1)).alias("n_base")
    )
    cur_counts = current.groupBy(F.col(dim_col).alias("dim")).agg(
        F.count(F.lit(1)).alias("n_cur")
    )
    joined = (
        base_counts.join(cur_counts, "dim", "full_outer")
        .select(
            "dim",
            F.coalesce(F.col("n_base"), F.lit(0)).alias("n_base"),
            F.coalesce(F.col("n_cur"), F.lit(0)).alias("n_cur"),
        )
    )
    totals = joined.agg(
        F.sum("n_base").alias("t_base"),
        F.sum("n_cur").alias("t_cur"),
        F.count(F.lit(1)).alias("n_dims"),
    )
    j = joined.crossJoin(F.broadcast(totals))
    # smoothed shares: (n + s) / (t + s * n_dims) — exact in double from
    # exact integers, identical in any engine
    p_base = (F.col("n_base") + F.lit(smoothing)) / (
        F.col("t_base") + F.lit(smoothing) * F.col("n_dims")
    )
    p_cur = (F.col("n_cur") + F.lit(smoothing)) / (
        F.col("t_cur") + F.lit(smoothing) * F.col("n_dims")
    )
    return j.select(
        "dim",
        "n_base",
        "n_cur",
        F.round(p_base, 6).alias("share_base"),
        F.round(p_cur, 6).alias("share_cur"),
        F.round((p_cur - p_base) * F.log(p_cur / p_base), 6).alias("psi"),
    ).orderBy("dim")


def numeric_drift_report(
    baseline: DataFrame,
    current: DataFrame,
    value_col: str,
    n_bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
    smoothing: float = 0.5,
) -> DataFrame:
    """PSI drift for a CONTINUOUS column: fixed-width bins over [lo, hi]
    (values outside clamp to the edge bins, NULLs get bin -1), then the
    categorical machinery of `distribution_drift_report` over the bin id.

    The bin edges must come from a FROZEN range — pass (lo, hi) from the
    baseline snapshot's published stats, the same way the learned-operator
    family freezes codebooks: recomputing the range per run would make
    reports incomparable across runs (a new outlier would silently rebin
    history). If omitted, the range is taken from the BASELINE's min/max
    (one cheap agg) — fine for one-off comparisons, but pin it for a
    monitoring series. Binning is exact integer arithmetic on both
    engines; the report inherits the categorical form's engine-exactness."""
    if lo is None or hi is None:
        row = baseline.agg(
            F.min(F.col(value_col)).alias("lo"), F.max(F.col(value_col)).alias("hi")
        ).collect()[0]
        lo = float(row.lo) if lo is None else lo
        hi = float(row.hi) if hi is None else hi
    width = (hi - lo) / n_bins if hi > lo else 1.0

    def binned(df: DataFrame) -> DataFrame:
        b = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("long")
        return df.select(
            F.when(F.col(value_col).isNull(), F.lit(-1))
            .otherwise(F.least(F.greatest(b, F.lit(0)), F.lit(n_bins - 1)))
            .cast("long")
            .alias("bin")
        )

    return distribution_drift_report(
        binned(baseline), binned(current), "bin", smoothing=smoothing
    ).withColumnsRenamed({"dim": "bin"})


def key_skew_report(df: DataFrame, key_col: str) -> DataFrame:
    """Skew diagnostic for a prospective shuffle/join key — the numbers
    that decide between a plain equi-join, AQE skew-split, and explicit
    salting BEFORE the expensive job runs: row/key counts, the frequency
    of the heaviest key and its share of all rows, exact p50/p90/p99 of
    the per-key frequency distribution, and the top key itself.

    One partial-agg count shuffle to ~n_keys rows; the stats over the
    (much smaller) frequency distribution run as a second ~n_keys-sized
    aggregate. Deterministic: the top key breaks frequency ties by key
    value, percentiles are exact (the frequency table is key-cardinality-
    sized, not data-sized — percentile_approx is the swap if even that is
    too wide)."""
    freq = df.groupBy(F.col(key_col).alias("key")).agg(F.count(F.lit(1)).alias("n"))
    return freq.agg(
        F.sum("n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_freq"),
        F.round(F.max("n") / F.sum("n"), 6).alias("max_share"),
        F.percentile("n", F.lit(0.5)).cast("double").alias("p50_freq"),
        F.percentile("n", F.lit(0.9)).cast("double").alias("p90_freq"),
        F.percentile("n", F.lit(0.99)).cast("double").alias("p99_freq"),
        F.max_by("key", F.struct(F.col("n"), F.col("key"))).alias("top_key"),
    )
