"""Exactly-once parquet TABLE sink for foreachBatch — the lakehouse-apply
counterpart of the CDC loop (r6 verdict #7), extending the DirQueue
batch-keyed idempotent recipe (streaming/queues.py) from a message log to
a queryable table.

Protocol (a deliberately minimal manifest-commit table format):

    <root>/data/batch-<BBBBBBBB>-part-<PPPPP>.parquet   data files
    <root>/data/compact-<GGG>-<bin>.parquet             compacted files
    <root>/_commits/batch-<BBBBBBBB>.json               per-batch manifest
    <root>/_commits/snapshot-<GGG>.json                 compaction snapshot

* `write_batch` (inside foreachBatch) writes each partition's rows to a
  file keyed by (batch_id, partition) — tmp file + atomic rename — then
  writes the batch manifest (the list of files + row counts) with the
  same tmp+rename. The MANIFEST IS THE COMMIT: readers resolve the table
  to manifest-listed files only, so a crash between data and manifest
  leaves invisible orphans, and Spark's replay of the same deterministic
  batch under the same batch_id overwrites its own files and re-commits
  the identical manifest. That is exactly-once at the TABLE level on top
  of Spark's at-least-once foreachBatch contract, the same argument as
  DirQueue's truncate-on-open — but here the artifact is queryable.
* `read_committed` resolves the current state: the highest-generation
  snapshot (if any) supersedes every batch manifest it covers; batch
  manifests above the snapshot's high-water batch apply on top. One
  manifest-dir listing, then a plain parquet scan of the resolved files
  — at scale this is the standard manifest-pruned read (no directory
  listing of data/, which may hold millions of files plus orphans).
* `compact_table` is the natural consumer of the compaction planner
  (operators/layout.py): FFD-bin the CURRENT committed files (manifest
  list, not a directory listing — orphans must not be compacted in),
  rewrite each multi-file bin as one file, then atomically publish a
  snapshot manifest covering everything up to the current high-water
  batch. Readers never see a half-compacted state: until the snapshot
  rename lands they resolve the old manifests; after it, the new files.
  Streaming appends landing DURING compaction are unaffected — their
  batch ids are above the snapshot's `covers` mark.
* `vacuum` deletes data files unreachable from the committed state
  (crashed-attempt orphans, pre-compaction originals) — safe because
  the committed state is resolved first and the delete set is the
  complement.

Everything is plain JSON + parquet + atomic rename; no services. The
single-writer assumption (one streaming query per table root, as Spark's
own checkpoint dir already requires) is what lets the manifest commit be
a rename instead of a log with CAS.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession


def _data_dir(root: str) -> str:
    return os.path.join(root, "data")


def _commits_dir(root: str) -> str:
    return os.path.join(root, "_commits")


def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(obj, fh, indent=1, sort_keys=True)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, path)


def write_batch(batch_df: DataFrame, batch_id: int, root: str) -> int:
    """foreachBatch body: write this micro-batch's rows as batch-keyed
    parquet files + one manifest. Returns the committed row count.

    Each input partition writes its own file executor-side (mapInPandas;
    partition id from TaskContext) to a tmp name, fsyncs, then renames —
    so a replayed batch's partition overwrites its own previous attempt
    and never appends. The driver collects the (file, rows, bytes) list
    (KB-sized) and publishes the manifest LAST: durability of data
    precedes the commit point, and the commit point precedes Spark's own
    offset commit — the same ordering as the reference's
    confirm-then-checkpoint (src/main.rs:226-234)."""
    data, commits = _data_dir(root), _commits_dir(root)
    os.makedirs(data, exist_ok=True)
    os.makedirs(commits, exist_ok=True)

    def write_parts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        tables = [pa.Table.from_pandas(pdf, preserve_index=False) for pdf in batches]
        tables = [t for t in tables if t.num_rows]
        if not tables:
            return
        name = f"batch-{batch_id:08d}-part-{pid:05d}.parquet"
        final = os.path.join(data, name)
        tmp = final + f".tmp-{os.getpid()}"
        t = pa.concat_tables(tables)
        pq.write_table(t, tmp)
        with open(tmp, "rb") as fh:
            os.fsync(fh.fileno())
        os.replace(tmp, final)
        yield pd.DataFrame(
            {"file": [name], "n_rows": [t.num_rows], "n_bytes": [os.path.getsize(final)]}
        )

    manifest_rows = batch_df.mapInPandas(
        write_parts, "file string, n_rows long, n_bytes long"
    ).collect()
    files = sorted(
        ({"file": r.file, "n_rows": int(r.n_rows), "n_bytes": int(r.n_bytes)}
         for r in manifest_rows),
        key=lambda d: d["file"],
    )
    _atomic_write_json(
        os.path.join(commits, f"batch-{batch_id:08d}.json"),
        {"batch_id": batch_id, "files": files},
    )
    return sum(f["n_rows"] for f in files)


def _committed_state(root: str) -> tuple[int, int, list[str]]:
    """(snapshot_generation, covered_batch, committed file names).
    generation/covered_batch are -1 when absent."""
    commits = _commits_dir(root)
    if not os.path.isdir(commits):
        return -1, -1, []
    snaps, batches = [], []
    for name in os.listdir(commits):
        if name.endswith(".tmp"):
            continue
        if name.startswith("snapshot-") and name.endswith(".json"):
            snaps.append(name)
        elif name.startswith("batch-") and name.endswith(".json"):
            batches.append(name)
    gen, covers, files = -1, -1, []
    if snaps:
        latest = max(snaps)  # zero-padded generation => lexicographic max
        with open(os.path.join(commits, latest)) as fh:
            snap = json.load(fh)
        gen, covers = int(snap["generation"]), int(snap["covers"])
        files = [f["file"] for f in snap["files"]]
    for name in sorted(batches):
        with open(os.path.join(commits, name)) as fh:
            m = json.load(fh)
        if int(m["batch_id"]) > covers:
            files.extend(f["file"] for f in m["files"])
    return gen, covers, files


def committed_files(root: str) -> list[str]:
    """Absolute paths of the files a reader must scan — the table's
    current committed state."""
    _, _, names = _committed_state(root)
    return [os.path.join(_data_dir(root), n) for n in names]


def read_committed(spark: SparkSession, root: str) -> DataFrame | None:
    """The exactly-once view: scan ONLY manifest-committed files (orphans
    from crashed attempts are invisible). Returns None for an empty
    table (no schema to synthesize)."""
    files = committed_files(root)
    if not files:
        return None
    return spark.read.parquet(*files)


def compact_table(
    spark: SparkSession, root: str, target_bytes: int = 128 << 20
) -> dict:
    """Compact the committed file set with the FFD planner and publish a
    snapshot manifest atomically. Returns a summary dict. Single-writer
    with respect to OTHER compactions; concurrent streaming appends are
    safe (their batch ids exceed the snapshot's `covers`)."""
    from crdb_changefeed_publisher_spark.operators.layout import ffd_bins

    gen, _covers, names = _committed_state(root)
    data = _data_dir(root)
    sized = [(n, os.path.getsize(os.path.join(data, n))) for n in names]
    batch_ids = [
        int(n.split("-")[1]) for n in names if n.startswith("batch-")
    ]
    high_water = max(batch_ids, default=-1)
    new_gen = gen + 1
    bins = ffd_bins(sized, target_bytes)
    out_files, rewritten = [], 0
    for i, b in enumerate(bins):
        if len(b) == 1:
            f, sz = b[0]
            out_files.append({"file": f, "n_rows": None, "n_bytes": sz})
            continue
        src = [os.path.join(data, f) for f, _ in b]
        t = pa.concat_tables([pq.read_table(p) for p in src], promote_options="default")
        name = f"compact-{new_gen:03d}-{i:05d}.parquet"
        final = os.path.join(data, name)
        tmp = final + f".tmp-{os.getpid()}"
        pq.write_table(t, tmp)
        with open(tmp, "rb") as fh:
            os.fsync(fh.fileno())
        os.replace(tmp, final)
        out_files.append(
            {"file": name, "n_rows": t.num_rows, "n_bytes": os.path.getsize(final)}
        )
        rewritten += len(b)
    _atomic_write_json(
        os.path.join(_commits_dir(root), f"snapshot-{new_gen:03d}.json"),
        {
            "generation": new_gen,
            "covers": high_water,
            "files": sorted(out_files, key=lambda d: d["file"]),
        },
    )
    return {
        "generation": new_gen,
        "covers": high_water,
        "bins": len(bins),
        "files_rewritten": rewritten,
        "files_now": len(out_files),
    }


def vacuum(root: str) -> list[str]:
    """Delete data files unreachable from the committed state: crashed-
    attempt orphans, tmp leftovers, and pre-compaction originals that a
    snapshot superseded. Resolves the committed set FIRST, so everything
    deleted is by construction invisible to readers. Returns the deleted
    names."""
    data = _data_dir(root)
    if not os.path.isdir(data):
        return []
    _, _, keep = _committed_state(root)
    keep_set = set(keep)
    gone = []
    for name in sorted(os.listdir(data)):
        if name not in keep_set:
            os.remove(os.path.join(data, name))
            gone.append(name)
    return gone
