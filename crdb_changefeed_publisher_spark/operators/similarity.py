"""Similarity search over embedding columns (array<float>).

Two paths:

- brute-force cosine top-k: broadcast the (small) query set against the
  corpus — an embarrassingly parallel map over corpus partitions followed by
  a per-query top-k (ranking window on the query key). Exact; the baseline.
- IVF (inverted-file) top-k: k-means-style cells (here: deterministic
  centroids = per-label mean vectors), queries probe only their nearest
  cell(s). At 100 TB the corpus is written partitioned by cell id so a probe
  prunes partitions at the scan; recall < 1 by construction.

Math is sequential-fold double precision (functions/vectors.py), so results
are reproducible and oracle-comparable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crdb_changefeed_publisher_spark.functions.vectors import as_double, cosine


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of `corpus` for each row of `queries`.

    Plan shape: BroadcastNestedLoopJoin (queries broadcast) -> per-partition
    score -> ranking window partitioned by query id. Scores are rounded to 6
    decimals *before* ranking with an id tiebreak, making the top-k set
    deterministic across engines and runs.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", F.round(cosine(F.col("qv"), F.col("cv")), 6))
        .select("query_id", "neighbor_id", "score")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "score", "rnk")
    )


def label_centroids(corpus: DataFrame, vec_col: str = "embedding", label_col: str = "label") -> DataFrame:
    """Deterministic IVF cells: mean vector per label.

    posexplode -> groupBy (label, pos) avg -> re-assemble ordered arrays.
    Two narrow shuffles over tiny data; at real scale centroids come from
    k-means (Spark ML) but the cell-probe mechanics below are identical.
    """
    exploded = corpus.select(
        F.col(label_col).alias("cell"), F.posexplode(as_double(F.col(vec_col))).alias("pos", "v")
    )
    return (
        exploded.groupBy("cell", "pos")
        .agg(F.avg("v").alias("mean_v"))
        .groupBy("cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mean_v"))), lambda s: s["mean_v"]
            ).alias("centroid")
        )
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Approximate top-k: each query probes its `n_probe` nearest cells and
    ranks only vectors in those cells. Cells here are the fixture's label
    partitions with mean-vector centroids.
    """
    cents = label_centroids(corpus, vec_col, label_col)
    q = queries.select(F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv"))
    probe_w = Window.partitionBy("query_id").orderBy(F.col("cell_score").desc(), F.col("cell"))
    probes = (
        q.join(F.broadcast(cents))
        .withColumn("cell_score", F.round(cosine(F.col("qv"), F.col("centroid")), 6))
        .withColumn("cell_rnk", F.row_number().over(probe_w))
        .filter(F.col("cell_rnk") <= n_probe)
        .select("query_id", "qv", "cell")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("cv"),
        F.col(label_col).alias("cell"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        c.join(F.broadcast(probes), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", F.round(cosine(F.col("qv"), F.col("cv")), 6))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "score", "rnk")
    )
