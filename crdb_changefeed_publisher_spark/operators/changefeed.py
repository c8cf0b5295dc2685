"""Changefeed envelope core — the reference pipeline as pure DataFrame ops.

Reference semantics (ducc/crdb-changefeed-publisher):
- wire tuple: 3 columns ``(table: str?, key: bytes?, value: bytes)``
  (src/main.rs:214-216, src/model.rs:86-100)
- decode: key/value are UTF-8 JSON text (src/main.rs:243,250)
- demux: ``table IS NULL AND key IS NULL`` => resolved-cursor row, else a
  data-change row (src/main.rs:242-253, src/model.rs:58-61)
- cursor extraction: parse ``{"resolved": "<hlc-ts>"}`` (src/model.rs:63-66)
- envelope: ``{"table": t, "key": k, "value": <raw JSON embedded verbatim>}``
  — serde RawValue semantics: ``value`` is spliced in unquoted and
  byte-preserved (src/model.rs:68-84, src/main.rs:222-223; golden example
  README.md:35-38)

Spark-first design: every step is a built-in column expression (JVM-side,
whole-stage-codegen'd) — no Python UDF anywhere in this hot path, so the
chain vectorizes and scales linearly with executors. Escaping of the
``table``/``key`` strings rides Jackson via ``to_json(struct(...))`` which
matches serde_json's JSON string escaping; the raw ``value`` is then spliced
in with ``concat`` to preserve RawValue byte-fidelity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The changefeed wire schema (reference src/model.rs:86-100): CRDB core
# changefeeds emit (table, key, value); key/value arrive as bytes of UTF-8
# JSON text.
CHANGEFEED_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("table", T.StringType(), True),
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
    ]
)

# After decode (reference src/main.rs:243,250): all strings.
CHANGEFEED_SCHEMA = T.StructType(
    [
        T.StructField("table", T.StringType(), True),
        T.StructField("key", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
    ]
)


def decode_changefeed(df: DataFrame, strict_utf8: bool = False) -> DataFrame:
    """UTF-8-decode binary key/value to strings (reference src/main.rs:243,250).

    Default (lenient): ``cast(BinaryType -> StringType)`` substitutes U+FFFD
    for invalid byte sequences — a documented divergence (the pipeline keeps
    flowing; bad rows stay observable in the output).
    ``strict_utf8=True`` restores exact reference behavior: the reference's
    ``String::from_utf8(...)?`` hard-errors on the first invalid sequence
    (src/main.rs:243,250), and so does ``validate_utf8`` here.
    """
    cols = [F.col("table")]
    for c in ("key", "value"):
        col = df.schema[c].dataType
        if isinstance(col, T.BinaryType):
            decoded = (
                F.validate_utf8(F.col(c)).cast("string")
                if strict_utf8
                else F.col(c).cast("string")
            )
            cols.append(decoded.alias(c))
        else:
            cols.append(F.col(c))
    return df.select(*cols)


def is_cursor_row() -> F.Column:
    """Resolved-cursor predicate (reference src/main.rs:245-247)."""
    return F.col("table").isNull() & F.col("key").isNull()


def split_changes(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Demux one decoded stream into (change_rows, cursor_rows).

    Mirrors ``ProcessedChange = Row | Cursor`` (reference src/model.rs:58-61).
    Both branches share the one scan; Catalyst pushes the null-test into the
    source read as a partition-local filter — no shuffle.
    """
    return df.filter(~is_cursor_row()), df.filter(is_cursor_row())


def extract_resolved(cursors: DataFrame) -> DataFrame:
    """Pull the ``resolved`` HLC timestamp out of cursor rows
    (reference src/model.rs:63-66, src/main.rs:229-235).
    """
    return cursors.select(
        F.get_json_object(F.col("value"), "$.resolved").alias("resolved")
    ).filter(F.col("resolved").isNotNull())


def envelope_col(
    table: F.Column | str = "table",
    key: F.Column | str = "key",
    value: F.Column | str = "value",
) -> F.Column:
    """Build the published envelope JSON line as a single column expression.

    Output: ``{"table":"<t>","key":"<k>","value":<raw JSON verbatim>}``
    matching serde's ChangePayload serialization (reference src/model.rs:68-84,
    golden README.md:35-38). The ``value`` JSON is embedded *unquoted and
    byte-identical* (RawValue semantics): table/key are JSON-escaped via
    ``to_json(struct(...))`` (Jackson escaping == serde escaping for JSON
    strings), the trailing ``}`` is dropped, and the raw value is spliced in.

    A change row with a NULL table, key, or value is malformed (only a row
    with BOTH table and key NULL is a cursor row): the reference hard-errors
    on such rows (src/main.rs:243-251 ``?`` on None), and ``to_json`` would
    otherwise silently drop the field, emitting an envelope that violates the
    documented 3-field schema — so this expression raises instead.
    """
    t = F.col(table) if isinstance(table, str) else table
    k = F.col(key) if isinstance(key, str) else key
    v = F.col(value) if isinstance(value, str) else value
    head = F.to_json(F.struct(t.alias("table"), k.alias("key")))
    envelope = F.concat(
        F.substring(head, 1, F.length(head) - F.lit(1)),
        F.lit(',"value":'),
        v,
        F.lit("}"),
    )
    return F.when(
        t.isNull() | k.isNull() | v.isNull(),
        F.raise_error(
            F.concat(
                F.lit("malformed change row (null field): table="),
                F.coalesce(t, F.lit("<null>")),
                F.lit(" key="),
                F.coalesce(k, F.lit("<null>")),
            )
        ),
    ).otherwise(envelope)


def to_envelopes(changes: DataFrame) -> DataFrame:
    """Change rows -> one-column DataFrame of envelope JSON lines."""
    return changes.select(envelope_col().alias("envelope"))


def changefeed_pipeline(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The full reference transform chain, batch or streaming:

    decode -> demux -> (envelopes to publish, resolved cursors to checkpoint)

    Works identically on a batch DataFrame and a streaming DataFrame — the
    streaming wrapper (streaming/pipeline.py) feeds a readStream through this
    same function, so the semantics are tested once in batch and reused.
    """
    decoded = decode_changefeed(df)
    changes, cursors = split_changes(decoded)
    return to_envelopes(changes), extract_resolved(cursors)


def latest_changes(changes: DataFrame, version_col: str = "version") -> DataFrame:
    """CDC UPSERT materialized view — the canonical consumer of the
    reference's change stream (reference `README.md:29-38` publishes
    row-level upserts; this is the \"apply them\" side): the LATEST value
    per (table, key), where latest is decided by `version_col` (feed
    sequence, HLC timestamp, or any monotonic per-key version).

    Output: (table, key, value = winning payload, latest_version,
    n_versions).

    Scale shape: ONE partial-aggregate shuffle via `max_by` — each map task
    pre-reduces to one candidate row per key before the exchange, so the
    shuffle volume is ~distinct keys, not change volume. A rank-window
    formulation would shuffle every change row and sort; this is the
    100 TB apply loop (and the batch twin of the incremental foreachBatch
    merge tested in tests/test_streaming_eventtime.py)."""
    return changes.groupBy("table", "key").agg(
        F.max_by("value", version_col).alias("value"),
        F.max(version_col).alias("latest_version"),
        F.count(F.lit(1)).alias("n_versions"),
    )


def typed_changes(
    changes: DataFrame,
    schema: str | None = None,
    sample_size: int = 100,
) -> DataFrame:
    """Typed view of the opaque change payload — the idiomatic Spark upgrade
    of the reference's untyped model (SURVEY.md §1.2): the reference never
    inspects `value` beyond the single `resolved` key; here the CRDB
    envelope ``{"after": {col: val, ...}}`` is parsed with `from_json` into
    real columns.

    `schema` is a DDL string for the ``after`` struct (e.g. ``"a INT,
    b STRING"``). When omitted it is INFERRED from a bounded driver-side
    sample of `sample_size` payloads — a one-time setup cost, not a per-row
    path; pass the schema explicitly in production so a malformed payload
    cannot silently widen a column to string.

    Rows whose value does not parse (or lacks ``after``) yield NULL columns
    rather than erroring — the streaming-safe posture: a poison message
    must not kill the pipeline; filter ``after IS NULL`` to a dead-letter
    sink if needed.
    """
    if schema is None:
        sample = [r.value for r in changes.select("value").limit(sample_size).collect()]
        if not sample:
            raise ValueError("typed_changes: cannot infer a schema from zero change rows")
        spark = changes.sparkSession
        inferred = spark.read.json(spark.sparkContext.parallelize(sample)).schema
        after_type = next((f.dataType for f in inferred.fields if f.name == "after"), None)
        if after_type is None:
            raise ValueError("typed_changes: sampled payloads have no 'after' field")
        parsed = F.from_json(F.col("value"), T.StructType([T.StructField("after", after_type)]))
    else:
        parsed = F.from_json(F.col("value"), f"after STRUCT<{schema}>")
    return changes.select("table", "key", parsed.getField("after").alias("after"))


def schema_evolution_report(
    changes: DataFrame,
    table_col: str = "table",
    value_col: str = "value",
    version_col: str = "version",
) -> DataFrame:
    """Upstream SCHEMA-DRIFT detector over a change stream: per (table,
    column-of-`after`), when the column first/last appeared and what that
    implies — the report a CDC apply loop consults before an ALTER TABLE,
    because the reference's JSON envelopes (README.md:37) carry whatever
    columns upstream has NOW, and a silently-added or dropped column is
    how an apply pipeline rots.

    Output: (table, column, n_present, n_rows, first_version,
    last_version, status) with status from integer version comparisons
    against the table's own [min, max] version span: 'added' (appears
    after the span starts), 'removed' (vanishes before it ends),
    'transient' (both), 'stable'. One explode of the key list + two
    partial-agg shuffles sized by (tables x columns) and (tables) — the
    payloads themselves never re-shuffle."""
    keys = F.json_object_keys(F.get_json_object(F.col(value_col), "$.after"))
    per_col = (
        changes.select(
            F.col(table_col).alias("table"),
            F.col(version_col).alias("_v"),
            F.explode(keys).alias("column"),
        )
        .groupBy("table", "column")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_present"),
            F.min("_v").alias("first_version"),
            F.max("_v").alias("last_version"),
        )
    )
    per_table = changes.groupBy(F.col(table_col).alias("table")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min(F.col(version_col)).alias("_tmin"),
        F.max(F.col(version_col)).alias("_tmax"),
    )
    added = F.col("first_version") > F.col("_tmin")
    removed = F.col("last_version") < F.col("_tmax")
    return (
        per_col.join(F.broadcast(per_table), "table")
        .select(
            "table",
            "column",
            "n_present",
            "n_rows",
            "first_version",
            "last_version",
            F.when(added & removed, F.lit("transient"))
            .when(added, F.lit("added"))
            .when(removed, F.lit("removed"))
            .otherwise(F.lit("stable"))
            .alias("status"),
        )
    )
