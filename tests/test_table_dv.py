"""Deletion vectors / merge-on-read (table_sink.delete_where): row-level
deletes that never rewrite data files. Covered here:

1. targeted delete: manifest pruning spares out-of-range files entirely,
   hit files gain DVs, NO data file is rewritten, and the read equals the
   copy-on-write expectation;
2. no-match delete publishes nothing (generation unchanged);
3. stacked overlapping deletes count each row once and union at read;
4. DVs compose with stats-pruned reads, time travel, and read_since;
5. compaction MATERIALIZES DVs (entries drop their refs, values equal),
   and vacuum then reclaims DV files + originals;
6. merge_upsert on a DV-carrying file does not resurrect deleted rows;
7. Spark float semantics: `>` deletes NaN rows (NaN orders above all);
8. optimize_zorder materializes DVs too.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from crdb_changefeed_publisher_spark.streaming import table_sink


def _mk_ranged(spark, root, n_files=4, per=100):
    # disjoint key-range files -> bounds can target deletes
    for b in range(n_files):
        df = spark.range(b * per, (b + 1) * per).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
        table_sink.write_batch(df.coalesce(1), b, root)


def _entries(root):
    commits = os.path.join(root, "_commits")
    snaps = [n for n in os.listdir(commits) if n.startswith("snapshot-")]
    assert snaps, "expected a snapshot"
    latest = max(snaps, key=lambda n: int(n[len("snapshot-"):-len(".json")]))
    with open(os.path.join(commits, latest)) as fh:
        return json.load(fh)["files"]


def test_delete_where_writes_dvs_never_rewrites_data(spark, tmp_path):
    root = str(tmp_path / "tbl")
    _mk_ranged(spark, root)
    before = {
        os.path.basename(p): os.path.getmtime(p)
        for p in table_sink.committed_files(root)
    }

    # keys 150..249 span files 1 and 2; files 0 and 3 are out of bounds
    res = table_sink.delete_where(
        spark, root, [("k", ">=", 150), ("k", "<", 250)])
    assert res["files_skipped"] == 2 and res["files_with_deletes"] == 2
    assert res["n_deleted"] == 100

    # no data file rewritten: same names, same mtimes; only dv-* added
    after = {
        os.path.basename(p): os.path.getmtime(p)
        for p in table_sink.committed_files(root)
    }
    assert after == before
    dvs = [n for n in os.listdir(os.path.join(root, "data"))
           if n.startswith("dv-")]
    assert len(dvs) == 2

    got = {r.k: r.v for r in table_sink.read_committed(spark, root).collect()}
    want = {k: k * 10 for k in range(400) if not (150 <= k < 250)}
    assert got == want

    # describe reports physical vs deleted
    d = table_sink.describe_table(root)
    assert d["n_rows"] == 400 and d["n_deleted_rows"] == 100


def test_delete_where_no_match_publishes_nothing(spark, tmp_path):
    root = str(tmp_path / "tbl")
    _mk_ranged(spark, root)
    res = table_sink.delete_where(spark, root, [("k", ">=", 5000)])
    assert res["n_deleted"] == 0 and res["files_skipped"] == 4
    assert not any(
        n.startswith("snapshot-")
        for n in os.listdir(os.path.join(root, "_commits"))
    )


def test_stacked_deletes_count_rows_once_and_union(spark, tmp_path):
    root = str(tmp_path / "tbl")
    _mk_ranged(spark, root)
    r1 = table_sink.delete_where(spark, root, [("k", "<", 30)])
    # overlaps [0, 30): only [30, 50) is newly deleted
    r2 = table_sink.delete_where(spark, root, [("k", "<", 50)])
    assert r1["n_deleted"] == 30 and r2["n_deleted"] == 20
    e0 = next(e for e in _entries(root) if e["file"].startswith("batch-00000000"))
    assert [d["n"] for d in e0["dvs"]] == [30, 20]
    assert table_sink.read_committed(spark, root).count() == 350
    # pruned read composes with DV subtraction
    assert table_sink.read_committed(
        spark, root, where=[("k", "<", 100)]).count() == 50


def test_time_travel_and_read_since_with_dvs(spark, tmp_path):
    root = str(tmp_path / "tbl")
    _mk_ranged(spark, root)
    table_sink.delete_where(spark, root, [("k", "<", 10)])
    # the delete snapshot covers batch 3; as_of that batch reflects it
    assert table_sink.as_of_batch(spark, root, 3).count() == 390
    # appends after the delete tail incrementally, unaffected by DVs
    table_sink.write_batch(
        spark.createDataFrame([(999, 1)], "k long, v long"), 4, root)
    delta, hw = table_sink.read_since(spark, root, 3)
    assert hw == 4 and delta.count() == 1
    assert table_sink.read_committed(spark, root).count() == 391


def test_compaction_materializes_dvs_and_vacuum_reclaims(spark, tmp_path):
    root = str(tmp_path / "tbl")
    _mk_ranged(spark, root)
    table_sink.delete_where(spark, root, [("k", ">=", 150), ("k", "<", 250)])
    res = table_sink.compact_table(spark, root, target_bytes=1 << 30)
    assert res["files_rewritten"] >= 2
    ents = _entries(root)
    assert not any(e.get("dvs") for e in ents)
    got = {r.k: r.v for r in table_sink.read_committed(spark, root).collect()}
    want = {k: k * 10 for k in range(400) if not (150 <= k < 250)}
    assert got == want
    gone = table_sink.vacuum(root, assume_quiesced=True, retention_secs=0.0)
    assert any(n.startswith("dv-") for n in gone)
    assert not any(
        n.startswith("dv-") for n in os.listdir(os.path.join(root, "data")))
    assert {r.k: r.v
            for r in table_sink.read_committed(spark, root).collect()} == want


def test_merge_does_not_resurrect_dv_deleted_rows(spark, tmp_path):
    root = str(tmp_path / "tbl")
    _mk_ranged(spark, root)
    table_sink.delete_where(spark, root, [("k", "=", 5)])
    # update key 7 (same file as deleted key 5) -> that file rewrites
    updates = spark.createDataFrame([(7, -7)], "k long, v long")
    table_sink.merge_upsert(spark, root, updates, "k")
    got = {r.k: r.v for r in table_sink.read_committed(spark, root).collect()}
    assert 5 not in got and got[7] == -7 and len(got) == 399
    # the merge materialized that file's DV: no refs remain
    assert not any(e.get("dvs") for e in _entries(root))


def test_delete_float_gt_matches_spark_nan_ordering(spark, tmp_path):
    root = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, 1.0), (2, float("nan")), (3, 100.0), (4, None), (5, 2.5)],
        "k long, x double")
    table_sink.write_batch(df.coalesce(1), 0, root)
    # Spark: NaN > 10.0 is TRUE (NaN orders above everything); null fails
    res = table_sink.delete_where(spark, root, [("x", ">", 10.0)])
    assert res["n_deleted"] == 2  # k=2 (NaN) and k=3 (100.0)
    assert sorted(
        r.k for r in table_sink.read_committed(spark, root).collect()
    ) == [1, 4, 5]


def test_zorder_materializes_dvs(spark, tmp_path):
    root = str(tmp_path / "tbl")
    for b in range(2):
        df = spark.range(b * 50, (b + 1) * 50).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("y"))
        table_sink.write_batch(df.coalesce(1), b, root)
    table_sink.delete_where(spark, root, [("k", "<", 10)])
    res = table_sink.optimize_zorder(spark, root, "k", "y", num_files=2)
    assert res["n_rows"] == 90
    assert not any(e.get("dvs") for e in _entries(root))
    assert table_sink.read_committed(spark, root).count() == 90


def test_vacuum_writer_safe_spares_in_flight_dv(spark, tmp_path):
    root = str(tmp_path / "tbl")
    _mk_ranged(spark, root, n_files=1)
    # simulate an in-flight delete_where: dv file for gen 0 (committed gen
    # is -1) written, snapshot not yet published
    data = os.path.join(root, "data")
    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(
        pa.table({"file": ["batch-00000000-part-00000.parquet"], "pos": [0]}),
        os.path.join(data, "dv-00000000-00000.parquet"))
    gone = table_sink.vacuum(root, retention_secs=0.0)
    assert gone == []
    gone = table_sink.vacuum(root, assume_quiesced=True, retention_secs=0.0)
    assert gone == ["dv-00000000-00000.parquet"]


def test_delete_preserves_batch_axis_history(spark, tmp_path):
    """A DV-only delete supersedes no data files, so its publish RETAINS
    the covered batch manifests (r8 ADVICE): pre-delete batch states
    stay time-travelable, a lagging read_since cursor keeps tailing
    instead of being forced into a full rebase, and a later REAL
    compaction still retires the history (the Delta DV lifecycle)."""
    root = str(tmp_path / "tbl")
    _mk_ranged(spark, root)  # batches 0..3, keys 0..399
    table_sink.delete_where(spark, root, [("k", "<", 10)])
    # batch-axis time travel to a pre-delete batch still works...
    assert table_sink.as_of_batch(spark, root, 1).count() == 200
    # ...and reflects the PRE-delete state of those batches
    assert table_sink.as_of_batch(
        spark, root, 1, where=[("k", "<", 10)]).count() == 10
    # as_of the delete's own batch reflects the delete (latest generation)
    assert table_sink.as_of_batch(spark, root, 3).count() == 390
    # a lagging incremental consumer's cursor survives the delete
    delta, hw = table_sink.read_since(spark, root, 1)
    assert hw == 3 and delta.count() == 200  # batches 2..3, raw appends
    # the delete still surfaces on the generation axis — and with the
    # manifests retained, even a delete that is the FIRST snapshot ever
    # (generation 0) has a readable pre-state (max_gen=-1: manifests only)
    diff, _ = table_sink.table_changes(spark, root, (3, -1), (3, 0))
    assert diff.count() == 10
    assert {r._change_type for r in diff.collect()} == {"delete"}
    # a later real compaction retires the batch history as before
    table_sink.compact_table(spark, root, target_bytes=1 << 30)
    commits = os.path.join(root, "_commits")
    assert not any(n.startswith("batch-") for n in os.listdir(commits))
    import pytest

    with pytest.raises(ValueError, match="compact"):
        table_sink.read_since(spark, root, 1)
    assert table_sink.read_committed(spark, root).count() == 390


def test_table_changes_absent_root_raises(spark, tmp_path):
    """Diffing against a mistyped/absent table root is an error, not an
    all-inserts diff (r8 ADVICE): _entries_as_of's None (no commit log)
    must not be conflated with a legitimately empty state."""
    import pytest

    with pytest.raises(ValueError, match="no commit log"):
        table_sink.table_changes(
            spark, str(tmp_path / "nope"), 0, 1)
