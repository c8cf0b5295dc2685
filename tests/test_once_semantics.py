"""`--once` drain semantics for the custom Python source + the idempotent
batch-keyed sink (the exactly-once-ish foreachBatch recipe)."""

from __future__ import annotations

import json

from crdb_changefeed_publisher_spark.sources.crdb_changefeed import register
from crdb_changefeed_publisher_spark.streaming.cursors import MemoryCursorStore
from crdb_changefeed_publisher_spark.streaming.pipeline import run_pipeline
from crdb_changefeed_publisher_spark.streaming.queues import DirQueue


def write_feed(path: str, n_rows: int, resolved_every: int) -> None:
    with open(path, "w") as f:
        for i in range(n_rows):
            f.write(json.dumps(["t", f"[{i}]", json.dumps({"after": {"a": i}})]) + "\n")
            if (i + 1) % resolved_every == 0:
                f.write(json.dumps([None, None, json.dumps({"resolved": f"{i}.0,0"})]) + "\n")


def test_drain_all_consumes_whole_recording_in_one_run(spark, tmp_path):
    """Trigger.AvailableNow degrades to a single micro-batch on a Python
    simple source (probed: 17/105 rows). drain_all must process EVERY
    recorded row in one `--once` invocation, across many micro-batches,
    and leave the cursor at the last resolved mark."""
    feed = str(tmp_path / "feed.jsonl")
    write_feed(feed, 100, 20)
    register(spark)
    sdf = (
        spark.readStream.format("crdb_changefeed")
        .option("replay", feed)
        .option("batch_limit", "17")  # forces ~7 micro-batches
        .load()
    )
    store = MemoryCursorStore()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = run_pipeline(sdf, out, ckpt, cursor_store=store, drain_all=True)
    assert not q.isActive
    msgs = [json.loads(m) for m in DirQueue.read_all(out)]
    ids = sorted(int(m["key"][1:-1]) for m in msgs)
    assert ids == list(range(100))
    assert store.get() == "99.0,0"


def test_idempotent_sink_batch_replay_no_duplicates(spark, tmp_path):
    """foreachBatch retries re-run the SAME batch_id; the batch-keyed dir
    sink truncates on open, so a replay overwrites its previous attempt
    instead of appending duplicates."""
    q = DirQueue(str(tmp_path / "q"), partition_id=0, batch_id=7)
    q.publish(b"m1")
    q.publish(b"m2")
    q.close()
    # simulate the Spark retry: same batch, same partition, fresh attempt
    q2 = DirQueue(str(tmp_path / "q"), partition_id=0, batch_id=7)
    q2.publish(b"m1")
    q2.publish(b"m2")
    q2.close()
    assert DirQueue.read_all(str(tmp_path / "q")) == [b"m1", b"m2"]
    # a DIFFERENT batch gets its own file and both survive
    q3 = DirQueue(str(tmp_path / "q"), partition_id=0, batch_id=8)
    q3.publish(b"m3")
    q3.close()
    assert DirQueue.read_all(str(tmp_path / "q")) == [b"m1", b"m2", b"m3"]
