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
