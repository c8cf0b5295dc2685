"""CLI parity tests (defaults match the reference cli.yml)."""

from __future__ import annotations

import pytest

from crdb_changefeed_publisher_spark.cli import parse_args


def test_defaults_match_reference():
    args = parse_args(["--table", "foo"])
    assert args.table == "foo"
    assert args.queue == "rabbitmq"
    assert args.cursor_store == "cockroachdb"
    assert args.cursor_frequency == "10s"


def test_table_required():
    with pytest.raises(SystemExit):
        parse_args([])


def test_spark_extensions_parse():
    args = parse_args(
        [
            "--table", "foo", "--replay", "f.jsonl", "--queue", "dir",
            "--out-dir", "/tmp/o", "--once", "--partitioned",
            "--epoch-rows", "500000", "--idempotent", "--fan-out-tables",
        ]
    )
    assert args.partitioned and args.epoch_rows == 500000
    assert args.idempotent and args.fan_out_tables and args.once
