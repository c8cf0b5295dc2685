"""Write-side data layout: Z-order clustering for multi-column scan locality.

At 100 TB the cheapest query is the one whose files you never open:
parquet readers prune row groups via min/max statistics, but stats only
help if the write layout clusters the filtered columns. Sorting by (a, b)
clusters a perfectly and b not at all; Z-ORDERING interleaves the bits of
both keys so files are rectangles in (a, b) space and min/max stats prune
on EITHER column.

`zvalue` is a pure codegen expression (shifts and masks, no UDF) and is
engine-portable — the oracle recomputes it bit for bit. `write_zordered`
is the standard recipe: repartitionByRange on the z-value (contiguous
z-ranges per file) + sortWithinPartitions (clustered row groups inside
each file)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low `bits` bits of two non-negative integer columns
    into a single z-order key (a's bit i lands at position 2i+1, b's at
    2i). Columns wider than `bits` bits must be range-compressed first
    (e.g. bucketized); 2*bits <= 62 keeps the result in a long."""
    z: Column | None = None
    for i in range(bits):
        abit = F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
        term = F.shiftleft(abit, 2 * i + 1) + F.shiftleft(bbit, 2 * i)
        z = term if z is None else z + term
    return z


def write_zordered(
    df: DataFrame,
    out_dir: str,
    col_a: str,
    col_b: str,
    num_files: int = 8,
    bits: int = 16,
) -> None:
    """Write parquet Z-ordered on (col_a, col_b): range-partition on the
    interleaved key so each file owns a contiguous z-range (a rectangle
    stack in key space), sort within partitions so row-group min/max
    stats are tight. The z column itself is dropped — layout is a
    physical property, not schema."""
    (
        df.withColumn("_z", zvalue(F.col(col_a), F.col(col_b), bits))
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def list_data_files(spark, path: str, suffix: str = ".parquet") -> list[tuple[str, int]]:
    """(file, bytes) for every data file directly under `path`, via the
    Hadoop FileSystem API (works on any FS Spark can read: local, HDFS,
    object stores). Metadata-only — no data is opened."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    out = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if st.isFile() and name.endswith(suffix) and not name.startswith("_"):
            out.append((st.getPath().toString(), int(st.getLen())))
    return sorted(out)


def ffd_bins(
    files: list[tuple[str, int]], target_bytes: int
) -> list[list[tuple[str, int]]]:
    """First-fit-decreasing binning of (file, bytes) pairs into bins of
    <= target_bytes (oversized files become singleton bins). Shared by
    the directory-level `compaction_plan` and the table sink's
    manifest-scoped compaction (streaming/table_sink.py), which bins a
    COMMITTED file list rather than a directory listing."""
    bins: list[list[tuple[str, int]]] = []
    room: list[int] = []
    for f, sz in sorted(files, key=lambda t: (-t[1], t[0])):
        for i in range(len(bins)):
            if room[i] >= sz:
                bins[i].append((f, sz))
                room[i] -= sz
                break
        else:
            bins.append([(f, sz)])
            room.append(max(target_bytes - sz, 0))
    return bins


def compaction_plan(
    spark, path: str, target_bytes: int = 128 << 20, suffix: str = ".parquet"
) -> DataFrame:
    """Small-file compaction PLAN for a parquet directory: group files
    into bins of <= `target_bytes` via first-fit-decreasing, so each bin
    becomes one coalesce-rewrite task. Only metadata moves here — the
    plan is the KB-sized artifact a maintenance job executes (read each
    bin's files, write one file, swap).

    Why it matters at 100 TB: streaming sinks and fine-grained ingest
    leave thousands of KB-sized files per partition; scan cost and
    driver planning time scale with FILE COUNT, not bytes. The FFD bound
    guarantees <= (11/9 OPT + 1) bins; singleton bins holding one
    already-large file (>= target) are marked `already_compact` so the
    executor skips them.

    Per-partition-directory invocation is the intended scale path (one
    plan per leaf directory, run from a foreachPartition over the leaf
    list); a single call lists ONE directory, driver-side, which is the
    correct cost model for a per-leaf maintenance task. Output one row
    per bin: (bin_id, n_files, total_bytes, already_compact, files)."""
    files = list_data_files(spark, path, suffix)
    bins = ffd_bins(files, target_bytes)
    rows = [
        (
            i,
            len(b),
            sum(sz for _, sz in b),
            len(b) == 1 and b[0][1] >= target_bytes,
            [f for f, _ in b],
        )
        for i, b in enumerate(bins)
    ]
    return spark.createDataFrame(
        rows,
        "bin_id int, n_files int, total_bytes long, already_compact boolean, "
        "files array<string>",
    )
