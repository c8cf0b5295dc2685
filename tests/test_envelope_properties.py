"""Property-based envelope invariants (hypothesis): for arbitrary
(table, key, value-JSON) rows, the pipeline emits envelopes that parse,
preserve all three fields exactly, embed value verbatim, and never leak
cursor rows into the publish branch."""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import Row

from crdb_changefeed_publisher_spark.operators.changefeed import (
    CHANGEFEED_SCHEMA,
    changefeed_pipeline,
)

# text without NUL (Spark UTF8String treats \x00 specially in casts)
text = st.text(
    alphabet=st.characters(blacklist_characters="\x00", max_codepoint=0x2FFF),
    min_size=0,
    max_size=40,
)
json_values = st.recursive(
    st.none() | st.booleans() | st.integers(-(2**31), 2**31) | text,
    lambda children: st.lists(children, max_size=3)
    | st.dictionaries(text, children, max_size=3),
    max_leaves=6,
)
change_rows = st.tuples(text.filter(bool), text.filter(bool), json_values)


def canon(d: dict) -> str:
    return json.dumps(d, sort_keys=True, ensure_ascii=False)


def test_envelope_roundtrip_properties(spark):
    @given(st.lists(change_rows, min_size=1, max_size=12), st.integers(0, 1000))
    @settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
    def prop(rows, resolved_ts):
        raw_values = [json.dumps(v, separators=(",", ":"), ensure_ascii=False) for _, _, v in rows]
        data = [
            Row(table=t, key=k, value=rv) for (t, k, _), rv in zip(rows, raw_values, strict=True)
        ]
        data.append(
            Row(table=None, key=None, value=json.dumps({"resolved": f"{resolved_ts}.0,0"}))
        )
        df = spark.createDataFrame(data, CHANGEFEED_SCHEMA)
        envelopes, cursors = changefeed_pipeline(df)

        got = [r.envelope for r in envelopes.collect()]
        assert len(got) == len(rows)
        # every line parses and the 3 fields round-trip exactly
        parsed = [json.loads(line) for line in got]
        expect = [{"table": t, "key": k, "value": v} for t, k, v in rows]
        assert sorted(map(canon, parsed)) == sorted(map(canon, expect))
        # RawValue fidelity: the exact serialized value bytes appear unquoted
        for line in got:
            assert any(f'"value":{rv}}}' == line[line.index('"value":'):] for rv in raw_values)
        # the cursor branch sees exactly the resolved row
        assert [r.resolved for r in cursors.collect()] == [f"{resolved_ts}.0,0"]

    prop()
