#!/usr/bin/env python
"""Materialize the ANN index as a CELL-PARTITIONED parquet table — the
write-time layout that docs/SCALE.md describes for 100 TB: the corpus is
stored partitioned by IVF cell with PQ codes next to the vector, and a
probe of n cells becomes PARTITION PRUNING at the parquet scan (the scan
opens only the probed cells' directories; the ANN work is done by the
file system layout, not by compute).

`load_index(spark, path, cells)` reads it back with the cell filter
pushed to partition discovery; tests/test_ann_index_layout.py asserts the
plan carries the PartitionFilters and that per-cell selection reads only
that cell's files.

Usage: python tools/build_ann_index.py [--sf-dir /root/testdata/sf0.01]
       [--out /tmp/ann_index]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession


def build_index(spark: SparkSession, sf_dir: str, out: str) -> None:
    from crdb_changefeed_publisher_spark.functions.codebooks import (
        CELL_CENTROIDS,
        PQ_CODEBOOKS,
    )
    from crdb_changefeed_publisher_spark.operators.similarity import encode_learned
    from crdb_changefeed_publisher_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    idx = encode_learned(emb, CELL_CENTROIDS, PQ_CODEBOOKS)
    # one directory per cell; files within a cell sorted by id for stable
    # row-group stats
    idx.repartition("cell").sortWithinPartitions("neighbor_id").write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(out)


def load_index(spark: SparkSession, path: str, cells: list[int] | None = None) -> DataFrame:
    """Read the index; with `cells` the filter is a PARTITION filter — the
    scan never opens unprobed cells' files."""
    df = spark.read.parquet(path)
    if cells is not None:
        df = df.filter(df.cell.isin([int(c) for c in cells]))
    return df


def build_two_level(spark: SparkSession, sf_dir: str, out: str) -> None:
    """Train the two-level codebook on the corpus, then persist the
    assignment as the write-time (cell, sub) layout — the r12 verdict #1
    path: a serving session points ivf_topk_two_level(from_index_path=out)
    at the directory and pays query-sized work per serve instead of the
    corpus-assignment exchange."""
    from crdb_changefeed_publisher_spark.operators.linalg import (
        kmeans_train_two_level,
    )
    from crdb_changefeed_publisher_spark.operators.similarity import (
        build_two_level_index,
    )
    from crdb_changefeed_publisher_spark.plans.llm import KMEANS_SCALE
    from crdb_changefeed_publisher_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents1, codebook = kmeans_train_two_level(emb, scale=KMEANS_SCALE)
    try:
        build_two_level_index(
            emb, cents1, codebook, out, scale=KMEANS_SCALE
        )
    finally:
        codebook.unpersist()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/ann_index")
    ap.add_argument(
        "--two-level", action="store_true",
        help="train a two-level codebook and persist the (cell, sub) "
        "layout (index/ + codebook/ + cents1.json) instead of the flat "
        "frozen-codebook index",
    )
    args = ap.parse_args()
    from crdb_changefeed_publisher_spark.session import get_spark

    spark = get_spark("ann-index-build")
    if args.two_level:
        build_two_level(spark, args.sf_dir, args.out)
        idx = spark.read.parquet(os.path.join(args.out, "index"))
        n = idx.count()
        n_cells = idx.select("cell").distinct().count()
        print(f"wrote {args.out}: {n} rows across {n_cells} cell partitions (two-level)")
    else:
        build_index(spark, args.sf_dir, args.out)
        n = spark.read.parquet(args.out).count()
        cells = sorted(r.cell for r in spark.read.parquet(args.out).select("cell").distinct().collect())
        print(f"wrote {args.out}: {n} rows across {len(cells)} cell partitions")
    spark.stop()


if __name__ == "__main__":
    main()
