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


@pytest.mark.parametrize("fmt", ["csv", "json"])
def test_streaming_reads_same_rows_through_text_formats(spark, sf_dir, tmp_path, fmt):
    """The streaming side of the format layer: readStream over a written
    CSV/JSON table (explicit schema — Structured Streaming refuses
    inference anyway) drains exactly the batch rows. Writer options must
    match load_any's (the CSV trim corner applies to streams too)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    path = str(tmp_path / f"feed.{fmt}")
    write_any(docs, path, fmt)

    reader = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    )
    if fmt == "csv":
        sdf = reader.option("header", "true").option("escape", '"').option(
            "multiLine", "true"
        ).csv(path)
    else:
        sdf = reader.json(path)

    seen: dict[int, str] = {}

    def collect_batch(batch_df, batch_id):
        for r in batch_df.collect():
            seen[r.doc_id] = r.text

    q = sdf.writeStream.foreachBatch(collect_batch).trigger(availableNow=True).start()
    q.awaitTermination(120)
    want = {r.doc_id: r.text for r in docs.collect()}
    assert seen == want and len(want) >= 400
