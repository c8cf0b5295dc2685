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
