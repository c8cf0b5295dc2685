"""Exercise the live CrdbConnection psycopg code path without a database: an
in-process fake `psycopg` module implementing the surface CrdbConnection
touches. Verifies the reference behaviors that were previously only
import-gated (src/main.rs:108-123 query construction executed over the
pg-wire cursor, row projection main.rs:214-218, GC-threshold error mapping
main.rs:188-203)."""

from __future__ import annotations

import sys
import types

import pytest

GC_MSG = "batch timestamp 1.5,0 must be after replica GC threshold 2.0"


class FakeCursor:
    def __init__(self, server):
        self.server = server
        self.rows = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def execute(self, query):
        self.server.executed.append(query)
        if self.server.gc_error:
            raise self.server.errors.Error(GC_MSG)
        self.rows = iter(self.server.rows)

    def __iter__(self):
        return self.rows


class FakeConnection:
    def __init__(self, url, server):
        self.url = url
        self.server = server

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def cursor(self):
        return FakeCursor(self.server)


class FakeServer:
    def __init__(self):
        self.rows: list[tuple] = []
        self.executed: list[str] = []
        self.gc_error = False
        self.errors = None


@pytest.fixture
def fake_psycopg(monkeypatch):
    server = FakeServer()
    mod = types.ModuleType("psycopg")

    class Error(Exception):
        pass

    errors_ns = types.SimpleNamespace(Error=Error)
    mod.errors = errors_ns
    server.errors = errors_ns
    mod.connect = lambda url: FakeConnection(url, server)
    monkeypatch.setitem(sys.modules, "psycopg", mod)
    return server


def test_crdb_connection_builds_and_executes_changefeed_query(fake_psycopg):
    from crdb_changefeed_publisher_spark.sources.crdb_changefeed import CrdbConnection

    fake_psycopg.rows = [
        ("foo", b"[54]", b'{"after": {"a": 54, "b": null}}'),
        (None, None, b'{"resolved": "3.0,0"}'),
    ]
    conn = CrdbConnection("postgresql://crdb:26257/d", "foo", "10s")
    rows = conn.fetch(0, None, 100)
    # query parity (main.rs:108-123): no cursor option on cold start
    assert fake_psycopg.executed == [
        "EXPERIMENTAL CHANGEFEED FOR foo WITH resolved = '10s'"
    ]
    assert [(r.table, r.key, r.value) for r in rows] == [
        ("foo", b"[54]", b'{"after": {"a": 54, "b": null}}'),
        (None, None, b'{"resolved": "3.0,0"}'),
    ]
    # resume carries the cursor option
    conn.fetch(0, "3.0,0", 100)
    assert fake_psycopg.executed[-1] == (
        "EXPERIMENTAL CHANGEFEED FOR foo WITH resolved = '10s', cursor = '3.0,0'"
    )


def test_crdb_connection_respects_limit(fake_psycopg):
    from crdb_changefeed_publisher_spark.sources.crdb_changefeed import CrdbConnection

    fake_psycopg.rows = [("t", b"[%d]" % i, b"{}") for i in range(10)]
    conn = CrdbConnection("postgresql://crdb", "t", "10s")
    assert len(conn.fetch(0, None, 3)) == 3


def test_crdb_connection_maps_gc_error(fake_psycopg):
    """The database's GC-threshold error becomes GcThresholdError (which the
    reader turns into the cursor-less fallback, main.rs:188-203); any other
    database error propagates fatally."""
    from crdb_changefeed_publisher_spark.sources.crdb_changefeed import (
        CrdbConnection,
        GcThresholdError,
    )

    conn = CrdbConnection("postgresql://crdb", "t", "10s")
    fake_psycopg.gc_error = True
    with pytest.raises(GcThresholdError):
        conn.fetch(0, "1.5,0", 10)

    # a non-GC database error propagates as-is (reference: process exit)
    import unittest.mock as mock

    fake_psycopg.gc_error = False
    boom = fake_psycopg.errors.Error("connection reset by peer")

    def bad_execute(self, query):
        raise boom

    with mock.patch.object(FakeCursor, "execute", bad_execute), pytest.raises(
        type(boom), match="connection reset"
    ):
        conn.fetch(0, None, 10)


def test_reader_gc_fallback_with_live_connection_shape(fake_psycopg):
    """End-to-end through ChangefeedSimpleStreamReader with the live
    connection class: GC error on the stored cursor -> cursor-less retry."""
    from crdb_changefeed_publisher_spark.sources import crdb_changefeed as src

    reader = src.ChangefeedSimpleStreamReader(
        {"table": "t", "cursor_frequency": "5s", "batch_limit": "100"}
    )
    assert isinstance(reader.conn, src.CrdbConnection)
    fake_psycopg.rows = [("t", b"[1]", b"{}")]
    fake_psycopg.gc_error = True

    # first fetch raises GC -> reader falls back to a cursor-less scan
    def flip(q):
        # the fallback (no cursor option) succeeds
        if "cursor =" not in q:
            fake_psycopg.gc_error = False

    orig = FakeCursor.execute

    def execute(self, query):
        flip(query)
        return orig(self, query)

    fake_psycopg.executed.clear()
    import unittest.mock as mock

    with mock.patch.object(FakeCursor, "execute", execute):
        it, end = reader.read({"pos": 0, "resolved": "0.5,0"})
    rows = list(it)
    assert rows == [("t", b"[1]", b"{}")]
    # two queries: with cursor (failed on GC), then cursor-less fallback
    assert "cursor = '0.5,0'" in fake_psycopg.executed[0]
    assert "cursor =" not in fake_psycopg.executed[1]
