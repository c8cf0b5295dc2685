"""Format-independence of the source layer (tables.load_any/write_any):
the same logical table round-trips through parquet, ORC, CSV, and
JSON-lines with VALUE equality — so every registry query's answer does
not depend on what file format the data arrived in. CSV and JSON are the
adversarial cases: quotes/whitespace in text columns, timestamp
rendering, null round-trips.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from crdb_changefeed_publisher_spark.tables import load_any, load_table, write_any


def _rows(df, cols):
    out = []
    for r in df.select(*cols).collect():
        out.append(tuple(r[c] for c in cols))
    return sorted(out, key=lambda t: tuple((v is None, str(v)) for v in t))


@pytest.mark.parametrize("fmt", ["orc", "csv", "json"])
@pytest.mark.parametrize("table", ["documents", "orders"])
def test_round_trip_value_equality(spark, sf_dir, tmp_path, fmt, table):
    """parquet -> fmt -> DataFrame equals the parquet original, value for
    value — longs, doubles, strings with spaces, and timestamps all
    survive; schema comes in explicitly for the text formats (the
    no-second-scan rule)."""
    base = load_table(spark, sf_dir, table)
    path = str(tmp_path / f"{table}.{fmt}")
    write_any(base, path, fmt)
    back = load_any(spark, path, fmt=fmt, schema=base.schema)
    assert back.schema == base.schema
    cols = base.columns
    assert _rows(back, cols) == _rows(base, cols)


def test_csv_quotes_newlines_and_nulls_round_trip(spark, tmp_path):
    """The adversarial CSV corner: embedded quotes, an embedded newline,
    a null, and an empty string — multiLine + explicit '\"' escaping
    round-trips all of them (except the empty-string/null conflation,
    CSV's documented lossy corner, pinned here so a silent change
    surfaces)."""
    df = spark.createDataFrame(
        [
            (1, 'he said "hi"'),
            (2, "line one\nline two"),
            (3, None),
            (4, "trailing space "),
        ],
        "id long, text string",
    )
    path = str(tmp_path / "adversarial.csv")
    write_any(df, path, "csv")
    back = load_any(spark, path, fmt="csv", schema=df.schema)
    got = {r.id: r.text for r in back.collect()}
    assert got[1] == 'he said "hi"'
    assert got[2] == "line one\nline two"
    assert got[3] is None
    assert got[4] == "trailing space "


def test_text_formats_require_schema(spark, sf_dir):
    with pytest.raises(ValueError, match="explicit schema"):
        load_any(spark, f"{sf_dir}/documents.parquet", fmt="csv")
    with pytest.raises(ValueError, match="unsupported format"):
        load_any(spark, "x.avro")


def test_query_answer_is_format_independent(spark, sf_dir, tmp_path):
    """A real aggregate (orders by priority: count + rounded sum) computed
    off the CSV copy equals the parquet answer — the property users
    actually rely on."""
    base = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders.csv")
    write_any(base, path, "csv")
    csv_df = load_any(spark, path, fmt="csv", schema=base.schema)

    def agg(df):
        return {
            (r.o_orderpriority, r.n, r.total)
            for r in df.groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("o_totalprice"), 2).alias("total"),
            )
            .collect()
        }

    assert agg(csv_df) == agg(base)
