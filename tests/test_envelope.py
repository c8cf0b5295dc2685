"""Golden envelope tests against the reference's executable spec
(/root/reference/README.md:29-38) and its demux/cursor semantics."""

from __future__ import annotations

import json

from pyspark.sql import Row

from crdb_changefeed_publisher_spark.operators.changefeed import (
    CHANGEFEED_WIRE_SCHEMA,
    changefeed_pipeline,
    decode_changefeed,
    extract_resolved,
    split_changes,
    to_envelopes,
)

GOLDEN_VALUE = '{"after": {"a": 54, "b": null}}'
GOLDEN_ENVELOPE = '{"table":"foo","key":"[54]","value":{"after": {"a": 54, "b": null}}}'


def wire_rows(spark, rows):
    data = [
        Row(
            table=t,
            key=k.encode() if k is not None else None,
            value=v.encode() if v is not None else None,
        )
        for t, k, v in rows
    ]
    return spark.createDataFrame(data, CHANGEFEED_WIRE_SCHEMA)


def test_golden_envelope_byte_exact(spark):
    """README.md:35-38: INSERT INTO foo VALUES (54) publishes exactly
    {"table":"foo","key":"[54]","value":{"after": {"a": 54, "b": null}}} —
    value embedded raw (unquoted, whitespace preserved)."""
    df = wire_rows(spark, [("foo", "[54]", GOLDEN_VALUE)])
    envelopes, cursors = changefeed_pipeline(df)
    assert [r.envelope for r in envelopes.collect()] == [GOLDEN_ENVELOPE]
    assert cursors.count() == 0


def test_cursor_rows_are_never_published(spark):
    df = wire_rows(
        spark,
        [
            ("foo", "[1]", '{"after": {"a": 1}}'),
            (None, None, '{"resolved": "1595866288.020022200,0"}'),
            ("foo", "[2]", '{"after": null}'),
        ],
    )
    envelopes, cursors = changefeed_pipeline(df)
    env = sorted(r.envelope for r in envelopes.collect())
    assert env == [
        '{"table":"foo","key":"[1]","value":{"after": {"a": 1}}}',
        '{"table":"foo","key":"[2]","value":{"after": null}}',
    ]
    assert [r.resolved for r in cursors.collect()] == ["1595866288.020022200,0"]


def test_escaping_matches_serde(spark):
    """Table/key strings must be JSON-escaped exactly like serde_json
    (quotes, backslashes, control chars)."""
    tricky = 'ta"ble\\with\nctrl\tchars'
    df = wire_rows(spark, [(tricky, '["a\\"b"]', "{}")])
    envelopes, _ = changefeed_pipeline(df)
    line = envelopes.collect()[0].envelope
    parsed = json.loads(line)
    assert parsed["table"] == tricky
    assert parsed["key"] == '["a\\"b"]'
    assert line == json.dumps(
        {"table": tricky, "key": '["a\\"b"]'}, separators=(",", ":")
    )[:-1] + ',"value":{}}'


def test_decode_and_demux_unit(spark):
    df = decode_changefeed(
        wire_rows(spark, [("t", "[1]", "{}"), (None, None, '{"resolved": "1.0,0"}')])
    )
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "string",
        "string",
        "string",
    ]
    changes, cursors = split_changes(df)
    assert changes.count() == 1
    assert cursors.count() == 1
    assert extract_resolved(cursors).collect()[0].resolved == "1.0,0"


def test_invalid_utf8_becomes_replacement_chars(spark):
    """Documented divergence from the reference (which errors,
    src/main.rs:243): invalid UTF-8 bytes decode to U+FFFD so the stream
    keeps flowing; the envelope stays parseable."""
    df = spark.createDataFrame(
        [("t", b"[1]", b'{"after": "\xff\xfe"}')],
        "table string, key binary, value binary",
    )
    envelopes, _ = changefeed_pipeline(df)
    line = envelopes.collect()[0].envelope
    assert "�" in line
    assert json.loads(line)["table"] == "t"


def test_invalid_utf8_strict_mode_errors_like_reference(spark):
    """strict_utf8=True restores exact reference behavior: hard-error on the
    first invalid byte sequence (src/main.rs:243,250 `?` on from_utf8)."""
    import pytest

    df = spark.createDataFrame(
        [("t", b"[1]", b'{"after": "\xff\xfe"}')],
        "table string, key binary, value binary",
    )
    with pytest.raises(Exception, match="(?i)utf"):
        decode_changefeed(df, strict_utf8=True).collect()
    # valid input passes untouched under strict mode
    ok = spark.createDataFrame(
        [("t", b"[1]", b'{"after": {"a": 1}}')],
        "table string, key binary, value binary",
    )
    assert decode_changefeed(ok, strict_utf8=True).collect()[0].value == '{"after": {"a": 1}}'


def test_envelope_plan_is_codegen_only(spark):
    """The hot path must stay JVM-side: no Python eval nodes in the plan."""
    df = wire_rows(spark, [("foo", "[54]", GOLDEN_VALUE)])
    envelopes = to_envelopes(decode_changefeed(df))
    plan = envelopes._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_typed_changes_inferred_and_explicit(spark):
    from crdb_changefeed_publisher_spark.operators.changefeed import typed_changes

    rows = [
        ("foo", "[54]", '{"after": {"a": 54, "b": null}}'),
        ("foo", "[55]", '{"after": {"a": 55, "b": "x"}}'),
        ("foo", "[56]", "not json at all"),
    ]
    changes = spark.createDataFrame(rows, "table string, key string, value string")

    explicit = typed_changes(changes, schema="a INT, b STRING").collect()
    by_key = {r.key: r for r in explicit}
    assert (by_key["[54]"].after.a, by_key["[54]"].after.b) == (54, None)
    assert by_key["[55]"].after.b == "x"
    assert by_key["[56]"].after is None  # poison row -> NULL, not an error

    inferred = typed_changes(changes)  # schema from the sampled payloads
    assert dict(inferred.select("after.*").dtypes)["a"] == "bigint"
    got = {r.key: r.after for r in inferred.collect()}
    assert got["[55]"].a == 55 and got["[56]"] is None


def test_typed_changes_requires_after_field(spark):
    import pytest

    from crdb_changefeed_publisher_spark.operators.changefeed import typed_changes

    changes = spark.createDataFrame(
        [("t", "[1]", '{"something_else": 1}')], "table string, key string, value string"
    )
    with pytest.raises(ValueError):
        typed_changes(changes)
