"""Custom PySpark streaming data source for CockroachDB core changefeeds
(Spark 4 Python data source API), short name ``crdb_changefeed``.

Reference semantics reproduced:
- query construction (src/main.rs:108-123):
  ``EXPERIMENTAL CHANGEFEED FOR {table} WITH resolved = '{freq}'[, cursor =
  '{ts}']`` — the entire scan+filter is pushed into CockroachDB; the offset
  (resolved HLC timestamp) is the only state.
- offset bootstrap (src/main.rs:136-148): no stored cursor -> changefeed
  starts from "now"; stored cursor -> resume.
- GC-threshold fallback (src/main.rs:188-203): when the database reports
  ``batch timestamp ... must be after replica GC threshold ...``, the cursor
  is too old; restart WITHOUT a cursor (skip to now, data loss accepted,
  logged loudly). Any other error is fatal (process exit in the reference;
  query failure here).

Because no live CockroachDB exists in this environment, the connection layer
is pluggable: ``JsonlReplayConnection`` replays changefeed-shaped rows from
a JSONL file (used by tests and the local bench); ``CrdbConnection`` holds
the psycopg wiring (import-gated).

Offsets: ``{"pos": <rows consumed>, "resolved": <last HLC ts or None>}``.
``pos`` makes the replay deterministic; a real changefeed uses ``resolved``
only (pos carries across restarts via Spark's offset log either way).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass
from enum import Enum
from typing import Iterator, Protocol

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import BinaryType, StringType, StructField, StructType

WIRE_SCHEMA = StructType(
    [
        StructField("table", StringType(), True),
        StructField("key", BinaryType(), True),
        StructField("value", BinaryType(), True),
    ]
)

# src/main.rs:188-203 — CRDB's "cursor older than GC window" message.
GC_THRESHOLD_RE = re.compile(
    r"^batch timestamp [0-9.,]* must be after replica GC threshold [0-9.,]*$"
)


class RetryReason(Enum):
    NONE = "none"
    INVALID_CURSOR = "invalid_cursor"


def should_retry(error_message: str) -> RetryReason:
    """Parity with src/main.rs:188-203: retry (cursor-less) only on the GC
    threshold error; everything else is fatal."""
    if GC_THRESHOLD_RE.match(error_message.strip()):
        return RetryReason.INVALID_CURSOR
    return RetryReason.NONE


def build_changefeed_query(table: str, frequency: str, cursor: str | None = None) -> str:
    """Parity with src/main.rs:108-123."""
    query = f"EXPERIMENTAL CHANGEFEED FOR {table} WITH resolved = '{frequency}'"
    if cursor is not None:
        query += f", cursor = '{cursor}'"
    return query


class GcThresholdError(RuntimeError):
    """Raised by a connection when the requested cursor predates the GC
    threshold (replays CRDB's error string)."""


@dataclass
class WireRow:
    table: str | None
    key: bytes | None
    value: bytes


class ChangefeedConnection(Protocol):
    """One logical changefeed subscription."""

    def fetch(self, pos: int, cursor: str | None, limit: int) -> list[WireRow]:
        """Return up to `limit` rows starting at `pos` (replay) / after
        `cursor` (live). Raises GcThresholdError when cursor is too old."""
        ...


class JsonlReplayConnection:
    """Replays changefeed rows from a JSONL file of ``[table, key, value]``
    triples (null table/key => resolved row). The test/bench double for a
    live changefeed; also how recorded changefeeds can be (re)processed.

    Byte offsets are cached per line position so the steady-state sequential
    fetch pattern (pos 0, then 1000, then 2000, ...) seeks straight to the
    batch start instead of rescanning the file head — O(batch) per
    micro-batch, O(n) total over a long recorded feed instead of O(n^2).
    The reader instance lives on the driver across micro-batches
    (SimpleDataSourceStreamReader), so the cache survives the whole run."""

    def __init__(self, path: str, gc_floor: int = 0) -> None:
        self.path = path
        # rows below this position are "garbage collected": fetching from
        # before the floor raises the CRDB GC error (for fallback tests)
        self.gc_floor = gc_floor
        # line position -> byte offset of that line's start
        self._pos_bytes: dict[int, int] = {0: 0}
        # diagnostics: total lines pulled off disk (skips + consumed);
        # tests assert this stays O(rows), not O(batches * rows)
        self.lines_scanned = 0

    def fetch(self, pos: int, cursor: str | None, limit: int) -> list[WireRow]:
        if pos < self.gc_floor:
            raise GcThresholdError(
                f"batch timestamp {cursor or '0.0'} must be after replica GC threshold 1.0"
            )
        out: list[WireRow] = []
        with open(self.path, "rb") as f:
            start = self._pos_bytes.get(pos)
            if start is None:
                # seek to the nearest known position at or below pos, then
                # skip forward line-by-line (first fetch at an arbitrary
                # restart offset; subsequent fetches hit the cache exactly)
                known = max(p for p in self._pos_bytes if p <= pos)
                f.seek(self._pos_bytes[known])
                for i in range(known, pos):
                    if not f.readline():
                        break
                    self.lines_scanned += 1
                    self._pos_bytes[i + 1] = f.tell()
            else:
                f.seek(start)
            i = pos
            while len(out) < limit:
                line = f.readline()
                if not line:
                    break
                self.lines_scanned += 1
                t, k, v = json.loads(line)
                out.append(
                    WireRow(
                        t,
                        k.encode() if k is not None else None,
                        v.encode(),
                    )
                )
                i += 1
                self._pos_bytes[i] = f.tell()
        return out


class CrdbConnection:
    """Live changefeed over the Postgres wire protocol. Requires psycopg and
    a reachable CockroachDB (DATABASE_URL) — not bundled in this
    environment, so the constructor gates on the import."""

    def __init__(self, database_url: str, table: str, frequency: str) -> None:
        try:
            import psycopg  # type: ignore[import-not-found]  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("psycopg is required for a live CRDB changefeed") from e
        self.database_url = database_url
        self.table = table
        self.frequency = frequency

    def fetch(self, pos: int, cursor: str | None, limit: int) -> list[WireRow]:  # pragma: no cover
        import psycopg

        query = build_changefeed_query(self.table, self.frequency, cursor)
        out: list[WireRow] = []
        with psycopg.connect(self.database_url) as conn, conn.cursor() as cur:
            try:
                cur.execute(query)
                for row in cur:
                    out.append(WireRow(row[0], row[1], row[2]))
                    if len(out) >= limit:
                        break
            except psycopg.errors.Error as e:
                if should_retry(str(e)) is RetryReason.INVALID_CURSOR:
                    raise GcThresholdError(str(e)) from e
                raise
        return out


class ChangefeedSimpleStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.options = options
        replay = options.get("replay")
        if replay:
            self.conn: ChangefeedConnection = JsonlReplayConnection(
                replay, gc_floor=int(options.get("gc_floor", "0") or 0)
            )
        else:
            self.conn = CrdbConnection(
                options.get("database_url") or "",
                options.get("table", ""),
                options.get("cursor_frequency", "10s"),
            )
        self.batch_limit = int(options.get("batch_limit", "10000") or 10000)

    def initialOffset(self) -> dict:
        # reference: no cursor stored -> start from now (main.rs:118-120);
        # for replay, "now" is position 0 of the recording.
        return {"pos": 0, "resolved": None}

    def _fetch(self, start: dict, limit: int) -> tuple[list[WireRow], int]:
        """Fetch up to `limit` rows; returns (rows, effective_start).

        `effective_start` is the position the rows actually begin at — equal
        to `start["pos"]` normally, but advanced to the GC floor after a
        fallback, so callers can compute the end offset from where the fetch
        really started (otherwise fallback batches would be replayed twice)."""
        try:
            return self.conn.fetch(start["pos"], start.get("resolved"), limit), start["pos"]
        except GcThresholdError as e:
            # main.rs:175 (ignore_cursor): fall back to a cursor-less scan —
            # skip to "now", accept the gap, log loudly.
            import logging

            logging.getLogger(__name__).warning(
                "changefeed cursor invalid (%s); restarting without cursor "
                "(data between cursor and now is lost, reference parity)",
                e,
            )
            if isinstance(self.conn, JsonlReplayConnection):
                floor = self.conn.gc_floor
                return self.conn.fetch(floor, None, limit), floor
            return self.conn.fetch(0, None, limit), 0

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        rows, effective_start = self._fetch(start, self.batch_limit)
        resolved = start.get("resolved")
        for r in rows:
            if r.table is None and r.key is None:
                try:
                    resolved = json.loads(r.value)["resolved"]
                except (json.JSONDecodeError, KeyError):
                    pass
        end = {"pos": effective_start + len(rows), "resolved": resolved}
        return iter([(r.table, r.key, r.value) for r in rows]), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        rows, effective_start = self._fetch(start, end["pos"] - start["pos"])
        # After a fallback, rows begin at the GC floor, not start['pos'];
        # never hand Spark more rows than the committed offset range.
        needed = end["pos"] - effective_start
        if len(rows) > max(needed, 0):
            rows = rows[: max(needed, 0)]
        return iter([(r.table, r.key, r.value) for r in rows])

    def commit(self, end: dict) -> None:
        # Spark's commit log is the durable cursor (cursors.rs:45-57 analog);
        # nothing to do source-side.
        pass


@dataclass
class FeedRangePartition(InputPartition):
    """A contiguous line range of the recorded feed, with the byte offset of
    its first line so the executor seeks straight there. Picklable (ships
    driver -> executor)."""

    path: str
    start_line: int
    end_line: int
    start_byte: int


class ChangefeedPartitionedStreamReader(DataSourceStreamReader):
    """Executor-parallel replay reader — the SCALE path for recorded feeds.

    The simple reader (`ChangefeedSimpleStreamReader`) routes every row
    through the driver (that is the simple API's contract) and mirrors the
    reference's one-connection serial scan (src/main.rs:211-213). This
    reader instead plans each micro-batch as `read_partitions` line ranges;
    the driver maintains only a byte-offset line index, and EXECUTORS open
    the feed and read their ranges directly — rows never touch the driver.
    Feed order is recoverable downstream because partitions are planned in
    feed order (Spark's input-partition index is the list position, so the
    publish path's (key, _seq) sort reproduces per-key order exactly as in
    the simple-reader path).

    GC-threshold parity: a batch start below `gc_floor` is clamped to the
    floor — the pre-floor rows are lost, loudly, exactly like the
    reference's ignore_cursor fallback (src/main.rs:175).

    Offsets are {"pos": <line count>}; each micro-batch claims ALL lines
    available at planning time (the Python stream API exposes no ReadLimit,
    and any driver-side cap would need the committed offset to be safe
    across checkpoint restarts — a stateful latestOffset that forgets the
    committed position on restart can hand Spark an offset BEHIND the
    checkpoint). `batch_limit` is a simple-reader option; it is ignored
    here.
    """

    def __init__(self, options: dict) -> None:
        path = options.get("replay")
        if not path:
            raise ValueError(
                "partitioned mode requires a recorded feed: .option('replay', ...)"
            )
        self.path = path
        self.gc_floor = int(options.get("gc_floor", "0") or 0)
        self.n_parts = max(1, int(options.get("read_partitions", "4") or 4))
        # _line_bytes[i] = byte offset of line i's start; driver-side only
        self._line_bytes: list[int] = [0]

    def _extend_index(self) -> None:
        with open(self.path, "rb") as f:
            f.seek(self._line_bytes[-1])
            while f.readline():
                self._line_bytes.append(f.tell())
        # a trailing partial line (no newline yet) still counts: readline
        # returned it; nothing to correct because replay feeds are
        # line-complete by construction (each record is written with \n)

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def latestOffset(self) -> dict:
        self._extend_index()
        return {"pos": len(self._line_bytes) - 1}

    def partitions(self, start: dict, end: dict):
        s, e = start["pos"], end["pos"]
        if s < self.gc_floor:
            import logging

            logging.getLogger(__name__).warning(
                "changefeed cursor %s below GC floor %s; skipping to floor "
                "(data loss, reference parity)",
                s,
                self.gc_floor,
            )
            s = min(self.gc_floor, e)
        self._extend_index()
        total = max(e - s, 0)
        n = max(min(self.n_parts, total), 1)
        bounds = [s + (total * i) // n for i in range(n + 1)]
        return [
            FeedRangePartition(self.path, bounds[i], bounds[i + 1], self._line_bytes[bounds[i]])
            for i in range(n)
        ]

    def read(self, partition: FeedRangePartition) -> Iterator[tuple]:
        with open(partition.path, "rb") as f:
            f.seek(partition.start_byte)
            for _ in range(partition.end_line - partition.start_line):
                line = f.readline()
                if not line:
                    break
                t, k, v = json.loads(line)
                yield (t, k.encode() if k is not None else None, v.encode())

    def commit(self, end: dict) -> None:
        pass


class CrdbChangefeedDataSource(DataSource):
    """spark.readStream.format("crdb_changefeed")
         .option("table", "foo")            # live mode (needs DATABASE_URL)
         .option("cursor_frequency", "10s")
         .option("replay", "/path/feed.jsonl")  # replay mode (tests/bench)
         .option("partitioned", "true")     # executor-parallel replay reads
         .option("read_partitions", "8")
    """

    @classmethod
    def name(cls) -> str:
        return "crdb_changefeed"

    def schema(self) -> StructType:
        return WIRE_SCHEMA

    def streamReader(self, schema: StructType) -> ChangefeedPartitionedStreamReader:
        # only the opt-in partitioned replay mode uses the full API; raising
        # NOT_IMPLEMENTED makes Spark fall back to simpleStreamReader()
        if str(self.options.get("partitioned", "")).lower() in ("true", "1"):
            return ChangefeedPartitionedStreamReader(dict(self.options))
        from pyspark.errors import PySparkNotImplementedError

        raise PySparkNotImplementedError(
            errorClass="NOT_IMPLEMENTED", messageParameters={"feature": "streamReader"}
        )

    def simpleStreamReader(self, schema: StructType) -> ChangefeedSimpleStreamReader:
        return ChangefeedSimpleStreamReader(dict(self.options))


def register(spark) -> None:
    spark.dataSource.register(CrdbChangefeedDataSource)
