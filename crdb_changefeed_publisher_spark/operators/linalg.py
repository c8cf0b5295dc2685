"""Distributed dense linear algebra over embedding columns.

The load-bearing pattern here is SINGLE-PASS REDUCTION TO d x d: statistics
like the Gram matrix X^T X, the dimension sums, and the covariance are tiny
(d=64 -> 4096 numbers) while X is the 100 TB side — so each partition GEMMs
its own rows into a local d x d partial (numpy, Arrow-batched) and only the
partials are shuffled. The wire cost is (partitions * d^2) rows, independent
of corpus size; this is exactly how IVF/PQ/PCA/whitening training reads a
petabyte corpus once.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# sentinel index used to multiplex dimension-sum rows (j == SUMS) and the
# row-count row (i == j == SUMS) through the same (i, j, val) partial stream
_SUMS = -1


def pca_project(
    emb: DataFrame,
    components: list[list[float]],
    mean: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Project each vector onto frozen PCA components (mean-centered):
    ``p_c = sum_i v_i * comp_c_i - offset_c`` with the offset
    ``sum_i mean_i * comp_c_i`` precomputed in Python and embedded as ONE
    literal — the projection is a per-row codegen expression (64 explicit
    multiply-adds per component, no interpreted lambda, no Python worker),
    so dimensionality reduction of a 100 TB embedding corpus is a pure map
    over the scan.

    Components come from tools/train_pca.py (covariance via the one-pass
    distributed Gram reduction, d x d eigh on the driver, frozen literals
    shared with the oracle — the learned-codebook convention)."""
    outs = []
    for c_idx, comp in enumerate(components):
        off = float(sum(m * c for m, c in zip(mean, comp)))
        term = F.lit(0.0)
        for i, c in enumerate(comp):
            term = term + F.element_at(F.col(vec_col), i + 1).cast("double") * F.lit(c)
        outs.append(F.round(term - F.lit(off), 4).alias(f"p{c_idx}"))
    return emb.select(id_col, *outs)


def pca_prefilter_topk(
    queries: DataFrame,
    corpus: DataFrame,
    components: list[list[float]],
    mean: list[float],
    k: int = 5,
    n_candidates: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN with PCA prefiltering: candidates are the `n_candidates` nearest
    per query in the k'-dim PROJECTED space (squared L2 on the codegen
    projections — 4 dims instead of 64, so the coarse distance costs ~6%
    of a full cosine and the scan reads 4 doubles/vector, not the
    embedding), then exact cosine reranks the bounded candidate set.

    Determinism contract (what keeps an approximate index value-verified):
    coarse distances round to 6 with an id tiebreak, so the CANDIDATE SET
    is reproducible on any engine; the rerank rounds + tiebreaks the same
    way. Candidate recall is a function of how much variance the frozen
    components capture — at scale the projected table is the thing you
    store sorted/clustered, and n_candidates dials recall vs rerank cost.

    Output matches the other top-k operators: (query_id, neighbor_id,
    score, rnk).
    """
    from pyspark.sql import Window

    from crdb_changefeed_publisher_spark.functions.vectors import as_double, cosine_arrow

    kk = len(components)
    qp = pca_project(queries, components, mean, vec_col, id_col).select(
        F.col(id_col).alias("query_id"), *[F.col(f"p{i}").alias(f"q{i}") for i in range(kk)]
    )
    cp = pca_project(corpus, components, mean, vec_col, id_col)
    d = None
    for i in range(kk):
        t = (F.col(f"q{i}") - F.col(f"p{i}")) * (F.col(f"q{i}") - F.col(f"p{i}"))
        d = t if d is None else d + t
    cand = (
        cp.join(F.broadcast(qp), F.col("query_id") != F.col(id_col))
        .select("query_id", F.col(id_col).alias("neighbor_id"), F.round(d, 6).alias("dpca"))
    )
    w_c = Window.partitionBy("query_id").orderBy(F.col("dpca").asc(), F.col("neighbor_id").asc())
    topc = (
        cand.withColumn("crnk", F.row_number().over(w_c))
        .filter(F.col("crnk") <= n_candidates)
        .select("query_id", "neighbor_id")
    )
    qv = queries.select(F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qe"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("ce"))
    scored = (
        topc.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select("query_id", "neighbor_id", cosine_arrow(F.col("qe"), F.col("ce")).alias("score"))
    )
    w_r = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w_r))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "score", "rnk")
    )


def gram_covariance(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(vectors) -> one row per (i, j): Gram entry ``sum_k x_ki * x_kj`` and
    covariance ``E[x_i x_j] - E[x_i] E[x_j]``, both rounded to 4.

    One mapInPandas pass accumulates a float64 ``X^T X`` partial, the
    per-dimension sums, and the row count per PARTITION (not per Arrow
    batch — accumulators live across the batch iterator), then emits
    d^2 + d + 1 rows; a groupBy(i, j) partial-agg combines partitions.
    Nothing downstream of the scan depends on the number of vectors.
    """

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        G: np.ndarray | None = None
        S: np.ndarray | None = None
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if G is None:
                d = X.shape[1]
                G = np.zeros((d, d))
                S = np.zeros(d)
            G += X.T @ X
            S += X.sum(axis=0)
            n += len(X)
        if G is None:
            return
        d = G.shape[0]
        ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
        yield pd.DataFrame(
            {
                "i": np.concatenate([ii.ravel(), np.arange(d), [_SUMS]]),
                "j": np.concatenate([jj.ravel(), np.full(d, _SUMS), [_SUMS]]),
                "val": np.concatenate([G.ravel(), S, [float(n)]]),
            }
        )

    partials = emb.select(vec_col).mapInPandas(part, "i int, j int, val double")
    agg = partials.groupBy("i", "j").agg(F.sum("val").alias("v"))
    n_row = agg.filter((F.col("i") == _SUMS) & (F.col("j") == _SUMS)).select(
        F.col("v").alias("n")
    )
    sums = agg.filter((F.col("j") == _SUMS) & (F.col("i") >= 0)).select(
        "i", F.col("v").alias("s")
    )
    gram = agg.filter(F.col("j") >= 0).select("i", "j", F.col("v").alias("g"))
    si = sums.select(F.col("i"), F.col("s").alias("s_i"))
    sj = sums.select(F.col("i").alias("j"), F.col("s").alias("s_j"))
    cov = F.col("g") / F.col("n") - (F.col("s_i") / F.col("n")) * (
        F.col("s_j") / F.col("n")
    )
    return (
        gram.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .crossJoin(F.broadcast(n_row))
        .select(
            "i",
            "j",
            F.round(F.col("g"), 4).alias("gram"),
            F.round(cov, 4).alias("cov"),
        )
    )
