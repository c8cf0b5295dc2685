"""Cell-partitioned ANN index layout: probing cells must become PARTITION
PRUNING at the parquet scan (the claim in docs/SCALE.md, made measurable):
the plan carries the cell predicate as a PartitionFilter, only the probed
cells' files are read, and the round-tripped index is identical to the
in-memory encode pass."""

from __future__ import annotations

from pyspark.sql import functions as F

from tools.build_ann_index import build_index, load_index


def test_index_roundtrip_and_partition_pruned_probe(spark, tmp_path):
    out = str(tmp_path / "ann_index")
    sf_dir = "/root/testdata/sf0.001"
    build_index(spark, sf_dir, out)

    from crdb_changefeed_publisher_spark.functions.codebooks import (
        CELL_CENTROIDS,
        PQ_CODEBOOKS,
    )
    from crdb_changefeed_publisher_spark.operators.similarity import encode_learned
    from crdb_changefeed_publisher_spark.tables import load_table

    mem = encode_learned(load_table(spark, sf_dir, "embeddings"), CELL_CENTROIDS, PQ_CODEBOOKS)
    want = {(r.neighbor_id, r.cell, tuple(r.codes)) for r in mem.collect()}
    got = {
        (r.neighbor_id, r.cell, tuple(r.codes))
        for r in load_index(spark, out).collect()
    }
    assert got == want and len(want) > 0

    # a 2-cell probe: the filter must reach partition discovery, and the
    # files actually read must belong to the probed cells only
    cells = sorted({c for (_, c, _) in want})[:2]
    probe = load_index(spark, out, cells=cells)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters")[1][:120]
    touched = {
        r.f
        for r in probe.select(
            F.element_at(F.split(F.input_file_name(), "/cell="), 2).alias("f")
        ).collect()
    }
    read_cells = {int(f.split("/")[0]) for f in touched}
    assert read_cells == set(cells)
    assert probe.count() == sum(1 for (_, c, _) in want if c in cells)
