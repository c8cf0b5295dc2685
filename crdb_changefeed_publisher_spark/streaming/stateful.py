"""Custom stateful streaming operators on transformWithStateInPandas (TWS),
Spark 4's StatefulProcessor API — keyed state that lives ACROSS micro-batches
in the state store, not in Python memory.

Why TWS and not applyInPandasWithState: the older API couples state to a
single (timeout-driven) update function; TWS gives named state variables
(ValueState/ListState/MapState), timers, and an init/close lifecycle — and
its state protocol is what new Spark stateful work targets. The operators
here are the library-grade versions of what a 100 TB ingest actually runs:

- `dedup_on_ingest`: exact content dedup across the WHOLE stream history —
  emit a document the first time its content hash arrives, swallow every
  later copy. Unlike `dropDuplicates` + watermark (which forgets keys once
  the watermark passes), the seen-set persists for the stream's lifetime in
  the state store. State per distinct content: one 8-byte count keyed by a
  32-byte hash — RocksDB-backed, it scales to billions of distinct
  documents per the state-store partition count, and the grouping key is
  the content hash so the shuffle carries 32 B + the row once.
- `running_totals`: per-key running (count, sum) emitted every time a key
  appears in a batch — the canonical keyed-accumulator shape (per-user
  spend, per-table change counts) with exactly one ValueState row per key.
- `sessionize`: event-time sessions via ListState + EVENT-TIME TIMERS — a
  session emits exactly when the watermark passes last-event + gap
  (cross-validated row for row against `F.session_window`); the template
  for session logic the built-in cannot express.
- `keyed_category_counts`: MapState sub-keyed accumulators (category ->
  count per key) — the state type for per-key maps that a ValueState
  struct would rewrite wholesale on every update.
- `keyed_top_k`: per-key streaming top-k with state bounded at k rows per
  key regardless of stream length — the accumulator shape a batch window
  cannot provide on an unbounded stream.
- `idle_flush_totals`: PROCESSING-TIME timers — flush a key's aggregate
  after `idle_seconds` of no arrivals, then clear its state; idleness is
  an arrival-time property no event-time watermark can express.
- `kmv_on_stream`: stream-lifetime per-key distinct estimation with a KMV
  sketch in state (bounded at k longs per key forever) — estimates
  bit-identical to the batch `kmv_sketch` over the same data.
- `streaming_funnel`: watermark-finalized greedy funnel (ListState buffer
  + event-time timers) — emissions equal the batch `funnel_counts` chain
  exactly on a drained stream; state per user is the chain plus only the
  not-yet-ripe buffer (bounded by watermark lag x event rate).

Together the operators exercise every TWS primitive (ValueState,
ListState, MapState, event-time timers, processing-time timers,
initial-state bootstrap). All
REQUIRE the RocksDB state store provider (TWS state lives in named
column families, unsupported by the default HDFS-backed provider) — use
`rocksdb_state(spark)` around query start, and the protobuf runtime in the
Spark workers (vendor/pbshim/sitecustomize.py wires the container's SDK
copy; see tests/conftest.py).

Reference parity note: the reference (a 595-LoC CDC pipe) has no stateful
operators at all; these cover the SURVEY §2.2 "custom stateful operator"
row with the API Spark steers new work toward.
"""

from __future__ import annotations

from contextlib import contextmanager

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

ROCKSDB_PROVIDER = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
_CHANGELOG_KEY = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)


@contextmanager
def rocksdb_state(spark, changelog_checkpointing: bool = True):
    """Scope the RocksDB state-store provider to a `with` block (the
    provider is read at query START, so wrap the .start() call). Restores
    the previous settings on exit — other queries in the session keep
    their provider.

    Changelog checkpointing defaults ON: without it, sub-second commit
    cadence races RocksDB snapshot maintenance (measured CANNOT_COMMIT at
    version ~12, docs/NEXT.md r6) — commits then upload a tiny changelog
    instead of a full snapshot, which is also the posture you want on a
    real cluster (faster commits, snapshot upload amortized in the
    background). Pass changelog_checkpointing=False to measure the
    snapshot-per-commit behavior deliberately."""
    prev = spark.conf.get(_PROVIDER_KEY, None)
    prev_cl = spark.conf.get(_CHANGELOG_KEY, None)
    spark.conf.set(_PROVIDER_KEY, ROCKSDB_PROVIDER)
    spark.conf.set(_CHANGELOG_KEY, "true" if changelog_checkpointing else "false")
    try:
        yield
    finally:
        for key, prev_val in ((_PROVIDER_KEY, prev), (_CHANGELOG_KEY, prev_cl)):
            if prev_val is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev_val)


class _FirstSeen(StatefulProcessor):
    """ValueState per content key: n = copies seen so far. Emits the first
    arrival (with is_first_copy=true) and NOTHING for later copies — the
    count still advances so a side query could expose duplicate pressure.

    Initial-state bootstrap (handleInitialState): keys present in the
    supplied corpus index start with n=1 BEFORE the first micro-batch, so
    contents already in the corpus never emit — the streaming form of
    `incremental_dedup_report`'s exact tier, without ever replaying the
    corpus through the stream."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._n = handle.getValueState("n", "n long")

    def handleInitialState(self, key, initialState, timerValues) -> None:
        self._n.update((1,))

    def handleInputRows(self, key, rows, timerValues):
        seen = self._n.get()[0] if self._n.exists() else 0
        first_id = None
        n_batch = 0
        for pdf in rows:
            if seen == 0 and first_id is None and len(pdf):
                first_id = pdf.iloc[0]["doc_id"]
            n_batch += len(pdf)
        self._n.update((seen + n_batch,))
        if seen == 0 and first_id is not None:
            yield pd.DataFrame(
                {"content_key": [key[0]], "doc_id": [first_id], "batch_copies": [n_batch]}
            )

    def close(self) -> None:
        pass


def dedup_on_ingest(
    stream_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    corpus: DataFrame | None = None,
) -> DataFrame:
    """Streaming exact dedup across the whole stream history: one output row
    per DISTINCT content, carrying the first-arriving id and how many copies
    landed in its first batch. Grouping key = raw 32-byte sha2 of the text
    (the shuffle-key trade measured in docs/SCALE.md).

    `corpus` (a BATCH DataFrame with the same text column) bootstraps the
    seen-set via TWS initial state: the corpus's distinct content hashes
    are loaded into the state store before the first micro-batch, so
    contents already in the corpus are swallowed from the start — the
    streaming twin of operators/dedup.py::incremental_dedup_report's
    exact tier. At scale the production input here is the PERSISTED
    content-hash index (32 B/doc), not the corpus itself."""
    keyed = stream_df.select(
        F.sha2(F.col(text_col), 256).alias("content_key"),
        F.col(id_col).alias("doc_id"),
    )
    initial = None
    if corpus is not None:
        initial = (
            corpus.select(F.sha2(F.col(text_col), 256).alias("content_key"))
            .distinct()
            .groupBy("content_key")
        )
    # id type derived from the input, not hardcoded 'long': string ids are
    # common in document stores, and a mismatched literal schema fails
    # Arrow conversion inside the TWS worker, not at plan time (ADVICE r6)
    id_type = stream_df.schema[id_col].dataType.simpleString()
    return keyed.groupBy("content_key").transformWithStateInPandas(
        _FirstSeen(),
        outputStructType=f"content_key string, doc_id {id_type}, batch_copies long",
        outputMode="Append",
        timeMode="None",
        initialState=initial,
    )


class _RunningTotals(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._tot = handle.getValueState("totals", "n long, total double")

    def handleInputRows(self, key, rows, timerValues):
        n, total = self._tot.get() if self._tot.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._tot.update((n, total))
        yield pd.DataFrame({"key": [key[0]], "n": [n], "total": [total]})

    def close(self) -> None:
        pass


def running_totals(
    stream_df: DataFrame, key_col: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """Per-key running (count, sum) across the stream's lifetime: exactly
    one ValueState row per key, updated and re-emitted each batch the key
    appears in (outputMode Update downstream)."""
    keyed = stream_df.select(
        F.col(key_col).cast("long").alias("key"), F.col(value_col).alias("value")
    )
    return keyed.groupBy("key").transformWithStateInPandas(
        _RunningTotals(),
        outputStructType="key long, n long, total double",
        outputMode="Update",
        timeMode="None",
    )


class _EventTimeSessions(StatefulProcessor):
    """ListState of open sessions (start_us, end_us, n, total) + one
    event-time TIMER per session at end + gap: when the watermark passes a
    session's close point the timer fires and the session row is emitted
    and dropped. Input rows later than the watermark were already dropped
    by TWS itself, so a merged session can never reopen after it fired —
    the same guarantee session_window's append mode gives."""

    def __init__(self, gap_us: int) -> None:
        self._gap_us = gap_us

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._sessions = handle.getListState(
            "sessions", "start long, end long, n long, total double"
        )

    def _merge(self, spans: list[tuple]) -> list[tuple]:
        spans.sort()
        out: list[tuple] = []
        for s in spans:
            if out and s[0] <= out[-1][1] + self._gap_us:
                p = out[-1]
                out[-1] = (p[0], max(p[1], s[1]), p[2] + s[2], p[3] + s[3])
            else:
                out.append(s)
        return out

    def handleInputRows(self, key, rows, timerValues):
        spans = [tuple(t) for t in self._sessions.get()] if self._sessions.exists() else []
        for pdf in rows:
            us = (pdf["ts"].astype("int64") // 1000).astype("int64")  # ns -> us
            for t, v in zip(us, pdf["value"]):
                spans.append((int(t), int(t), 1, float(v)))
        spans = self._merge(spans)
        self._sessions.put(spans)
        for s in spans:
            # ms precision: round UP so the timer never fires before the
            # exact close point
            self._handle.registerTimer(-(-(s[1] + self._gap_us) // 1000))
        return iter(())

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        wm_us = timerValues.getCurrentWatermarkInMs() * 1000
        spans = [tuple(t) for t in self._sessions.get()] if self._sessions.exists() else []
        ripe = [s for s in spans if s[1] + self._gap_us <= wm_us]
        rest = [s for s in spans if s[1] + self._gap_us > wm_us]
        if rest:
            self._sessions.put(rest)
        else:
            self._sessions.clear()
        for s in ripe:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [s[0]],
                    "session_end": [s[1]],
                    "n_events": [s[2]],
                    "total_value": [s[3]],
                }
            )

    def close(self) -> None:
        pass


def sessionize(
    stream_df: DataFrame,
    gap_minutes: int = 30,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Event-time sessionization as an explicit TWS stateful operator —
    the timer-driven form of `F.session_window` (which stays the
    declarative fast path; this exists for session logic the built-in
    cannot express: per-session custom payloads, early heartbeats,
    side outputs). Sessions close when the WATERMARK passes last-event +
    gap, exactly like session_window's append mode; the test
    cross-validates the two row for row.

    Input must carry a watermark on `ts_col`. Output times are integer
    MICROSECONDS (cross-engine exact; cast with timestamp_micros)."""
    keyed = stream_df.select(
        F.col(key_col).cast("long").alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("value"),
    )
    return keyed.groupBy("user_id").transformWithStateInPandas(
        _EventTimeSessions(gap_minutes * 60_000_000),
        outputStructType=(
            "user_id long, session_start long, session_end long, "
            "n_events long, total_value double"
        ),
        outputMode="Append",
        timeMode="EventTime",
    )


class _CategoryCounts(StatefulProcessor):
    """MapState per key: category -> running count. Each batch emits the
    UPDATED categories' current totals (Update-mode downstream keeps the
    max per (key, category))."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counts = handle.getMapState("counts", "cat string", "n long")

    def handleInputRows(self, key, rows, timerValues):
        batch: dict[str, int] = {}
        for pdf in rows:
            for c, n in pdf["cat"].value_counts().items():
                batch[str(c)] = batch.get(str(c), 0) + int(n)
        out_c, out_n = [], []
        for c, n in batch.items():
            prev = self._counts.getValue((c,))[0] if self._counts.containsKey((c,)) else 0
            self._counts.updateValue((c,), (prev + n,))
            out_c.append(c)
            out_n.append(prev + n)
        yield pd.DataFrame({"key": [key[0]] * len(out_c), "cat": out_c, "n": out_n})

    def close(self) -> None:
        pass


def keyed_category_counts(
    stream_df: DataFrame, key_col: str = "user_id", cat_col: str = "event_type"
) -> DataFrame:
    """Per-key per-category running counts in a MapState (one map row per
    (key, category) in the state store — the state type for sub-keyed
    accumulators, where a ValueState would force rewriting the whole
    accumulator struct on every update and a per-(key,category) grouping
    would explode the shuffle key space). Emits updated categories' running
    totals each batch; Update-mode consumers keep the latest per
    (key, category)."""
    keyed = stream_df.select(
        F.col(key_col).cast("long").alias("key"),
        F.col(cat_col).cast("string").alias("cat"),
    )
    return keyed.groupBy("key").transformWithStateInPandas(
        _CategoryCounts(),
        outputStructType="key long, cat string, n long",
        outputMode="Update",
        timeMode="None",
    )


class _TopK(StatefulProcessor):
    """ListState bounded at k (item, score) pairs per key: merge each
    batch's candidates into the retained list, keep the k best, emit the
    key's CURRENT top-k with ranks plus the cumulative seen-count (the
    version stamp Update-mode consumers key "latest" on)."""

    def __init__(self, k: int) -> None:
        self._k = k

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._best = handle.getListState("best", "item string, score double")
        self._seen = handle.getValueState("seen", "n long")

    def handleInputRows(self, key, rows, timerValues):
        best = [tuple(t) for t in self._best.get()] if self._best.exists() else []
        seen = self._seen.get()[0] if self._seen.exists() else 0
        for pdf in rows:
            seen += len(pdf)
            best.extend(zip(pdf["item"].astype(str), pdf["score"].astype(float)))
        # deterministic order: score desc, item asc — ulp-stable ties
        best.sort(key=lambda t: (-t[1], t[0]))
        best = best[: self._k]
        self._best.put(best)
        self._seen.update((seen,))
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(best),
                "rnk": list(range(1, len(best) + 1)),
                "item": [b[0] for b in best],
                "score": [b[1] for b in best],
                "n_seen": [seen] * len(best),
            }
        )

    def close(self) -> None:
        pass


def keyed_top_k(
    stream_df: DataFrame,
    k: int = 3,
    key_col: str = "user_id",
    item_col: str = "event_type",
    score_col: str = "value",
) -> DataFrame:
    """Per-key streaming top-k by score across the stream's lifetime —
    state bounded at k rows per key NO MATTER how long the stream runs
    (the property a `collect_list`-style accumulator lacks). A batch
    row_number() window over the same data gives the identical answer
    (cross-validated in tests); this operator exists for the UNBOUNDED
    stream where no batch window can run. Emits the key's current top-k
    each batch it appears in; `n_seen` stamps emissions so Update-mode
    consumers can keep the latest."""
    keyed = stream_df.select(
        F.col(key_col).cast("long").alias("key"),
        F.col(item_col).cast("string").alias("item"),
        F.col(score_col).cast("double").alias("score"),
    )
    return keyed.groupBy("key").transformWithStateInPandas(
        _TopK(k),
        outputStructType="key long, rnk int, item string, score double, n_seen long",
        outputMode="Update",
        timeMode="None",
    )


class _IdleFlush(StatefulProcessor):
    """ValueState accumulator + PROCESSING-TIME timers: every batch a key
    appears in re-arms a timer at now + idle_ms; when a timer fires, the
    key flushes (emits its accumulated aggregate) only if it has really
    been idle for >= idle_ms — stale timers from earlier batches are
    ignored (cheaper than delete-and-re-register under RocksDB)."""

    def __init__(self, idle_ms: int) -> None:
        self._idle_ms = idle_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._acc = handle.getValueState("acc", "n long, total double, last_ms long")

    def handleInputRows(self, key, rows, timerValues):
        n, total, _ = self._acc.get() if self._acc.exists() else (0, 0.0, 0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        now_ms = timerValues.getCurrentProcessingTimeInMs()
        self._acc.update((n, total, now_ms))
        self._handle.registerTimer(now_ms + self._idle_ms)
        return iter(())

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        if not self._acc.exists():
            return  # already flushed by an earlier timer
        n, total, last_ms = self._acc.get()
        now_ms = timerValues.getCurrentProcessingTimeInMs()
        if now_ms - last_ms < self._idle_ms:
            return  # newer arrivals re-armed the key; this timer is stale
        self._acc.clear()
        yield pd.DataFrame({"key": [key[0]], "n": [n], "total": [total]})

    def close(self) -> None:
        pass


def idle_flush_totals(
    stream_df: DataFrame,
    idle_seconds: float = 2.0,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Flush-on-idle keyed aggregation (PROCESSING-TIME timers — the last
    TWS primitive the library set didn't exercise): accumulate (count,
    sum) per key and emit the aggregate only once the key has received no
    rows for `idle_seconds` of wall-clock, then clear — so a key that
    goes quiet costs ZERO state afterwards. The pattern behind
    micro-batch-boundary-free upload batching, connection-close flushes,
    and "end of burst" triggers, none of which event-time watermarks can
    express (idleness is about ARRIVAL time, not event time). Append
    mode: exactly one row per (key, burst)."""
    keyed = stream_df.select(
        F.col(key_col).cast("long").alias("key"),
        F.col(value_col).cast("double").alias("value"),
    )
    return keyed.groupBy("key").transformWithStateInPandas(
        _IdleFlush(int(idle_seconds * 1000)),
        outputStructType="key long, n long, total double",
        outputMode="Append",
        timeMode="ProcessingTime",
    )


class _KmvState(StatefulProcessor):
    """ListState holding the bottom-k retained hashes per key (ascending,
    <= k longs). Each batch merges the new hashes and re-truncates; the
    emitted estimate uses the SAME exact int64 arithmetic as the batch
    estimator, so stream-lifetime estimates are bit-identical to a batch
    `kmv_sketch` over the same data."""

    def __init__(self, k: int, kmv_range: int) -> None:
        self._k = k
        self._range = kmv_range

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._ks = handle.getListState("ks", "h long")
        self._seen = handle.getValueState("seen", "n long")

    def handleInputRows(self, key, rows, timerValues):
        ks = [t[0] for t in self._ks.get()] if self._ks.exists() else []
        seen = self._seen.get()[0] if self._seen.exists() else 0
        merged = set(ks)
        for pdf in rows:
            seen += len(pdf)
            merged.update(int(h) for h in pdf["h"])
        ks = sorted(merged)[: self._k]
        self._ks.put([(h,) for h in ks])
        self._seen.update((seen,))
        if len(ks) < self._k:
            est = len(ks)
        else:
            est = (self._k - 1) * self._range // max(ks[-1], 1)
        yield pd.DataFrame(
            {"key": [key[0]], "est_distinct": [est], "n_seen": [seen]}
        )

    def close(self) -> None:
        pass


def kmv_on_stream(
    stream_df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "user_id",
    k: int = 64,
) -> DataFrame:
    """Stream-lifetime per-key distinct estimation via a KMV sketch in TWS
    state — the streaming twin of `operators/sketches.kmv_sketch`, with
    state bounded at k longs per key FOREVER (an exact streaming distinct
    would grow with the value space; watermark-scoped dropDuplicates
    forgets history). Values are hashed JVM-side with the SAME portable
    `kmv_hash` before the shuffle (8 B/row on the wire, definition kept
    in one place), and the Python merge + estimator use the same exact
    int64 arithmetic — so the final streaming estimates are BIT-IDENTICAL
    to the batch sketch over the same data (cross-validated in tests).
    Update mode; `n_seen` stamps emissions so consumers keep the latest."""
    from crdb_changefeed_publisher_spark.operators.sketches import KMV_RANGE, kmv_hash

    keyed = stream_df.select(
        F.col(key_col).cast("string").alias("key"),
        kmv_hash(F.col(value_col)).alias("h"),
    )
    return keyed.groupBy("key").transformWithStateInPandas(
        _KmvState(k, KMV_RANGE),
        outputStructType="key string, est_distinct long, n_seen long",
        outputMode="Update",
        timeMode="None",
    )


class _WatermarkFunnel(StatefulProcessor):
    """Watermark-finalized greedy funnel (the streaming twin of
    operators/funnel.py::funnel_counts).

    The correctness lever: greedy-earliest over a TIME-SORTED final event
    stream never revises a decision — step i is the FIRST qualifying
    event after t_{i-1}, and later events are never earlier. So the exact
    streaming form is to buffer per-user events until the watermark
    passes them, then fold the ripe ones (ts <= W) into the chain in ts
    order. Ripe events are complete (TWS EventTime mode drops rows behind
    the watermark before they reach this processor), so every chain entry
    set during a fold is FINAL the moment it is set — emissions are
    append-mode clean, no retraction ever needed.

    Retention/pruning rule (the design question from docs/NEXT.md r6):
    state per user = the chain (<= n_steps timestamps, kept forever) plus
    ONLY the not-yet-ripe buffer (ts > W) — folded events are discarded
    in the same commit, so buffered state is bounded by the watermark lag
    times the user's event rate, independent of stream length. An
    event-time timer at the earliest pending ts guarantees the fold runs
    when the watermark advances past it even if the user never appears in
    another batch."""

    def __init__(self, n_steps: int, gap_us: int | None) -> None:
        self._n = n_steps
        self._gap = gap_us

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._buf = handle.getListState("buf", "ts long, step int")
        self._chain = handle.getListState("chain", "step int, ts long")

    def _fold(self, key, wm_us: int):
        buf = [tuple(t) for t in self._buf.get()] if self._buf.exists() else []
        chain = (
            {int(s): int(t) for s, t in self._chain.get()}
            if self._chain.exists()
            else {}
        )
        ripe = sorted((b for b in buf if b[0] <= wm_us))
        pending = [b for b in buf if b[0] > wm_us]
        new: list[tuple[int, int]] = []
        for ts, step in ripe:
            if step in chain:
                continue
            if step == 1:
                chain[1] = ts
                new.append((1, ts))
            else:
                prev_t = chain.get(step - 1)
                if (
                    prev_t is not None
                    and ts > prev_t
                    and (self._gap is None or ts - prev_t <= self._gap)
                ):
                    chain[step] = ts
                    new.append((step, ts))
        if pending:
            self._buf.put(pending)
            # ceil to ms so the timer never fires before the event is ripe
            self._handle.registerTimer(-(-min(p[0] for p in pending) // 1000))
        else:
            self._buf.clear()
        if new:
            self._chain.put(sorted(chain.items()))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(new),
                    "step": [s for s, _ in new],
                    "reached_ts": [t for _, t in new],
                }
            )

    def handleInputRows(self, key, rows, timerValues):
        add = []
        for pdf in rows:
            us = (pdf["ts"].astype("int64") // 1000).astype("int64")  # ns -> us
            for t, s in zip(us, pdf["step"]):
                add.append((int(t), int(s)))
        if add:
            self._buf.appendList(add)
        yield from self._fold(key, timerValues.getCurrentWatermarkInMs() * 1000)

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        yield from self._fold(key, timerValues.getCurrentWatermarkInMs() * 1000)

    def close(self) -> None:
        pass


def streaming_funnel(
    stream_df: DataFrame,
    steps: list[str],
    max_gap_seconds: int | None = None,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming funnel over a watermarked event stream: one APPEND row per
    (user, step) the moment the watermark finalizes that step — semantics
    identical to the batch `funnel_counts` chain (greedy-earliest, strict
    ts ordering, optional max-gap), cross-validated in tests on a drained
    stream. Downstream per-step user counts are `groupBy(step).count()`
    over the sink.

    Input must carry a watermark on `ts_col`. Non-step event types are
    filtered before the shuffle (the watermark node upstream still sees
    them, so sentinel/heartbeat events advance the clock without entering
    state). Output `reached_ts` is integer MICROSECONDS."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    step_idx = F.create_map(
        *[x for i, et in enumerate(steps) for x in (F.lit(et), F.lit(i + 1))]
    )
    keyed = (
        stream_df.filter(F.col(type_col).isin(steps))
        .select(
            F.col(key_col).cast("long").alias("user_id"),
            F.col(ts_col).alias("ts"),
            step_idx[F.col(type_col)].cast("int").alias("step"),
        )
    )
    gap_us = None if max_gap_seconds is None else max_gap_seconds * 1_000_000
    return keyed.groupBy("user_id").transformWithStateInPandas(
        _WatermarkFunnel(len(steps), gap_us),
        outputStructType="user_id long, step int, reached_ts long",
        outputMode="Append",
        timeMode="EventTime",
    )


class _BloomSeenFilter(StatefulProcessor):
    """ValueState per BLOCK: the block's packed Bloom words. Each content
    hash routes to exactly one block and sets all k bits INSIDE it (a
    blocked Bloom filter — the cache-local variant), so per-key state is a
    fixed array<long> and the whole filter is the union of block states.

    Rows within a (block, batch) fold in (h, doc_id) order before testing
    — two contents whose bit sets overlap would otherwise make emission
    depend on arrival order, and the deterministic fold is what lets a
    driver-side simulation reproduce the stream's output exactly."""

    def __init__(self, block_words: int, k: int) -> None:
        self._block_words = block_words
        self._k = k

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._words = handle.getValueState("w", "w array<long>")

    def handleInitialState(self, key, initialState, timerValues) -> None:
        # bootstrap: a batch-built blocked-Bloom state
        # (operators/bloom.py::bloom_block_states) becomes this block's
        # starting words — corpus contents test as already-seen without
        # replaying the corpus through the stream. Words arrive in the
        # same signed int64 packing the fold re-emits.
        self._words.update(([int(w) for w in initialState["words"].iloc[0]],))

    def handleInputRows(self, key, rows, timerValues):
        from crdb_changefeed_publisher_spark.operators.bloom import (
            BLOOM_COEFFS,
            BLOOM_MOD,
        )

        words = list(self._words.get()[0]) if self._words.exists() else [0] * self._block_words
        m_block = self._block_words * 64
        coeffs = BLOOM_COEFFS[: self._k]
        out_id, out_h = [], []
        pending = []
        for pdf in rows:
            pending.extend(zip(pdf["h"].tolist(), pdf["doc_id"].tolist()))
        for h, doc_id in sorted(pending):
            bits = [((h * a + b) % BLOOM_MOD) % m_block for a, b in coeffs]
            if all((words[p >> 6] >> (p & 63)) & 1 for p in bits):
                continue  # seen before (or a false positive swallowed it)
            for p in bits:
                words[p >> 6] |= 1 << (p & 63)
            out_id.append(doc_id)
            out_h.append(h)
        # re-pack into signed int64 range for the Arrow long column
        self._words.update(([w - (1 << 64) if w >= 1 << 63 else w for w in words],))
        if out_id:
            yield pd.DataFrame(
                {"block": [key[0]] * len(out_id), "doc_id": out_id, "content_h": out_h}
            )

    def close(self) -> None:
        pass


def bloom_seen_filter(
    stream_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_blocks: int = 256,
    block_words: int = 8,
    k: int = 5,
    initial_states: DataFrame | None = None,
) -> DataFrame:
    """Approximate stream-lifetime seen-filter with BOUNDED state: emit a
    document the first time its content arrives, swallow later copies —
    like `dedup_on_ingest`, but state is a FIXED n_blocks * block_words *
    8 bytes total (here 256 * 64 B = 16 KB) instead of growing with the
    number of distinct contents forever. The price is a known false-
    positive rate (a tiny fraction of genuinely-new documents swallowed as
    "seen" once blocks fill) — the crawl/ingest seen-filter trade, sized
    by the same arithmetic as operators/bloom.py.

    Deterministic end to end: content hash and block id are computed
    JVM-side (the shuffle carries 16 B + the id, never the text), bit
    positions use the exact-int64 affine family, and the per-batch fold is
    (h, id)-sorted — so a driver-side fold over the same batches
    reproduces the emission set exactly (tested), fp swallows included."""
    from crdb_changefeed_publisher_spark.operators.bloom import BLOOM_SEED
    from crdb_changefeed_publisher_spark.operators.sketches import kmv_hash

    keyed = stream_df.select(
        F.pmod(kmv_hash(F.col(text_col), BLOOM_SEED), F.lit(n_blocks))
        .cast("int")
        .alias("block"),
        kmv_hash(F.col(text_col), BLOOM_SEED).alias("h"),
        F.col(id_col).alias("doc_id"),
    )
    id_type = stream_df.schema[id_col].dataType.simpleString()
    kwargs = {}
    if initial_states is not None:
        # (block int, words array<long>) from operators/bloom.py::
        # bloom_block_states — delivered to handleInitialState per block
        # before the first micro-batch
        kwargs["initialState"] = initial_states.groupBy("block")
    return keyed.groupBy("block").transformWithStateInPandas(
        _BloomSeenFilter(block_words, k),
        outputStructType=f"block int, doc_id {id_type}, content_h long",
        outputMode="Append",
        timeMode="None",
        **kwargs,
    )


class _ChangelogDeltas(StatefulProcessor):
    """ValueState per record key: the key's current (grp, v, version).
    Each batch folds the key's arriving changes in version order (stale
    versions <= the applied high-water are ignored — the idempotent
    guard against upstream redelivery) and emits the RETRACTION pair for
    the net effect: (-1, -old_v) against the old group if the key had
    state, (+1, +new_v) into the new group unless the fold ended in a
    delete. No-op folds (same group and value) emit nothing."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        # grp IS NULL == tombstone: a deleted key keeps its row so the
        # applied-version high-water survives — clearing state instead
        # would let a redelivered stale insert resurrect the key
        self._cur = handle.getValueState("cur", "grp string, v double, ver long")

    def handleInputRows(self, key, rows, timerValues):
        old = tuple(self._cur.get()) if self._cur.exists() else None
        applied_ver = old[2] if old is not None else -(1 << 62)
        pending = []
        for pdf in rows:
            pending.extend(
                zip(
                    pdf["version"].tolist(),
                    pdf["grp"].tolist(),
                    pdf["v"].tolist(),
                    pdf["deleted"].tolist(),
                )
            )
        old_gv = None if old is None or old[0] is None else (old[0], old[1])
        state = old_gv
        ver = applied_ver
        for version, grp, v, deleted in sorted(pending, key=lambda t: t[0]):
            if version <= ver:
                continue  # stale redelivery
            ver = version
            state = None if deleted else (grp, float(v))
        out_g, out_dn, out_dv = [], [], []
        if old_gv != state:
            if old_gv is not None:
                out_g.append(old_gv[0]); out_dn.append(-1); out_dv.append(-old_gv[1])
            if state is not None:
                out_g.append(state[0]); out_dn.append(1); out_dv.append(state[1])
        if state is None:
            self._cur.update((None, 0.0, ver))  # tombstone
        else:
            self._cur.update((state[0], state[1], ver))
        if out_g:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(out_g),
                    "grp": out_g,
                    "dn": out_dn,
                    "dv": out_dv,
                }
            )

    def close(self) -> None:
        pass


def changelog_deltas(
    stream_df: DataFrame,
    key_col: str = "key",
    version_col: str = "version",
    group_col: str = "grp",
    value_col: str = "v",
    deleted_col: str = "deleted",
) -> DataFrame:
    """Turn an AFTER-only upsert stream into a RETRACTION stream (the
    Flink-changelog shape): one (-1, -old_value) / (+1, +new_value) delta
    pair per net key transition, so any downstream per-group aggregate is
    maintained by a plain SUM over the deltas — the streaming half of
    operators/matview.py::incremental_group_totals, with the key's
    current row held in TWS state instead of probed from a base table.
    State per key: (group, value, applied_version) — the applied-version
    high-water also makes upstream redelivery idempotent (stale versions
    fold to nothing). Emissions are deterministic: per-key folds are
    version-sorted, and replay from a checkpoint regenerates the
    identical deltas against the restored pre-batch state."""
    keyed = stream_df.select(
        F.col(key_col).alias("key"),
        F.col(version_col).cast("long").alias("version"),
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("double").alias("v"),
        F.col(deleted_col).alias("deleted"),
    )
    id_type = stream_df.schema[key_col].dataType.simpleString()
    return keyed.groupBy("key").transformWithStateInPandas(
        _ChangelogDeltas(),
        outputStructType=f"key {id_type}, grp string, dn long, dv double",
        outputMode="Append",
        timeMode="None",
    )
