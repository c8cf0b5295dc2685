#!/usr/bin/env python
"""Reproduce the ANN recall-vs-scan-fraction numbers cited in docs/SCALE.md.

For each n_probe in 1..N_CELLS: run learned-codebook IVF and IVF-PQ against
exact brute-force cosine top-k on the same queries, report recall@k, the
scan fraction (probed cells / total cells), and the RANDOM-PROBE baseline
(the recall an oracle-ranked scan of n_probe uniformly random cells would
get — the information limit of cell-blocking itself). Prints ONE JSON line.

`--fixture clustered` swaps the corpus for a deterministic 16-cluster
synthetic (same 2000x64 shape as the sf0.1 fixture) and RETRAINS the
IVF/PQ codebooks on it with the same tools/train_codebooks.py machinery —
the apples-to-apples demonstration that the index machinery delivers high
recall when the data HAS cluster structure (the driver fixture's embeddings
are isotropic iid noise: measured off-diagonal cosine mean -0.001, std
0.126 = 1/sqrt(64), and no within-label lift — so its recall ceiling is the
random-probe baseline plus own-cell concentration, not an index defect).

Usage: python tools/ann_recall.py [--sf-dir /root/testdata/sf0.01] [--k 5]
       [--probes 1,2,4,8,16] [--fixture driver|clustered]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def topk_set(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def recall(approx: dict[int, set[int]], exact: dict[int, set[int]]) -> float:
    hits = sum(len(approx.get(q, set()) & s) for q, s in exact.items())
    total = sum(len(s) for s in exact.values())
    return round(hits / total, 4)


def clustered_fixture(spark, n: int = 2000, dim: int = 64, n_clusters: int = 16,
                      noise: float = 0.35, seed: int = 11):
    """Deterministic clustered corpus, same shape as the driver fixture:
    unit-norm cluster centers + Gaussian noise (sigma=noise per dim before
    renormalization), labels = true cluster."""
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, n_clusters, n)
    pts = centers[labels] + noise * rng.standard_normal((n, dim)) / (dim**0.5)
    rows = [
        (int(i), [float(round(x, 4)) for x in pts[i]], int(labels[i]))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")


def random_probe_recall(exact: dict[int, set[int]], cell_of: dict[int, int],
                        n_cells: int, n_probe: int, repeats: int = 5) -> float:
    """Information-limit baseline: recall@k of an ORACLE-ranked scan over
    n_probe uniformly random cells (no learned probe ranking). Anything a
    learned index earns must clear this line."""
    import random

    rng = random.Random(97)
    total_hits, total = 0, 0
    for _ in range(repeats):
        for q, neigh in exact.items():
            probed = set(rng.sample(range(n_cells), n_probe))
            total_hits += sum(1 for nb in neigh if cell_of.get(nb) in probed)
            total += len(neigh)
    return round(total_hits / total, 4)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--probes", default="1,2,4,8,16")
    ap.add_argument("--fixture", choices=("driver", "clustered"), default="driver")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from crdb_changefeed_publisher_spark.functions import codebooks as cb
    from crdb_changefeed_publisher_spark.operators import similarity
    from crdb_changefeed_publisher_spark.session import get_spark
    from crdb_changefeed_publisher_spark.tables import load_table

    spark = get_spark("ann_recall")
    if args.fixture == "clustered":
        emb = clustered_fixture(spark).cache()
        # SAME trainer as the frozen fixture codebooks — the point of the
        # study is that identical machinery reaches high recall on data
        # with real cluster structure
        from train_codebooks import train

        cell_centroids, pq_codebooks = train(
            emb.select(F.col("embedding").alias("e"))
        )
    else:
        emb = load_table(spark, args.sf_dir, "embeddings")
        cell_centroids, pq_codebooks = cb.CELL_CENTROIDS, cb.PQ_CODEBOOKS
    queries = emb.filter(F.col("vec_id") % 25 == 0)

    exact = topk_set(similarity.brute_force_topk(queries, emb, k=args.k))
    encoded = similarity.encode_learned(emb, cell_centroids, pq_codebooks).persist()
    cell_of = {r.neighbor_id: r.cell for r in encoded.select("neighbor_id", "cell").collect()}

    rows = []
    for n_probe in [int(p) for p in args.probes.split(",")]:
        ivf = topk_set(
            similarity.ivf_topk(
                queries, emb, k=args.k, n_probe=n_probe,
                cell_centroids=cell_centroids, encoded=encoded,
            )
        )
        ivfpq = topk_set(
            similarity.ivf_pq_topk(
                queries, emb, k=args.k, n_probe=n_probe,
                cell_centroids=cell_centroids, codebooks=pq_codebooks,
                encoded=encoded,
            )
        )
        rows.append(
            {
                "n_probe": n_probe,
                "scan_fraction": round(n_probe / len(cell_centroids), 4),
                "ivf_recall": recall(ivf, exact),
                "ivfpq_recall": recall(ivfpq, exact),
                "ivfpq_vs_ivf": recall(ivfpq, ivf),
                "random_probe_recall": random_probe_recall(
                    exact, cell_of, len(cell_centroids), n_probe
                ),
            }
        )
    # PCA-prefilter path on the SAME fixture: frozen components for the
    # driver fixture, retrained (same math as tools/train_pca.py: mean +
    # covariance eigh, sign-fixed, rounded) for the clustered one. The
    # recall dial here is n_candidates (coarse 4-dim scan keeps the top-N,
    # exact cosine reranks), reported as candidate fraction of the corpus.
    import numpy as np

    from crdb_changefeed_publisher_spark.operators import linalg

    if args.fixture == "clustered":
        X = np.array(
            [r.embedding for r in emb.orderBy("vec_id").collect()], dtype=np.float64
        )
        mu = X.mean(axis=0)
        evals, evecs = np.linalg.eigh(np.cov(X, rowvar=False, bias=True))
        comps = evecs[:, np.argsort(evals)[::-1][:4]].T
        for c in comps:
            if c[np.argmax(np.abs(c))] < 0:
                c *= -1
        pca_mean = [round(float(x), 4) for x in mu]
        pca_comps = [[round(float(x), 4) for x in c] for c in comps]
    else:
        from crdb_changefeed_publisher_spark.functions import pca_components as pc

        pca_mean, pca_comps = pc.PCA_MEAN, pc.PCA_COMPONENTS

    n_corpus = emb.count()
    pca_rows = []
    for n_cand in (25, 50, 100):
        approx = topk_set(
            linalg.pca_prefilter_topk(
                queries, emb, pca_comps, pca_mean, k=args.k, n_candidates=n_cand
            )
        )
        pca_rows.append(
            {
                "n_candidates": n_cand,
                "candidate_fraction": round(n_cand / n_corpus, 4),
                "pca_recall": recall(approx, exact),
            }
        )

    print(
        json.dumps(
            {
                "metric": "ann_recall_at_k",
                "k": args.k,
                "fixture": args.fixture,
                "sf_dir": args.sf_dir if args.fixture == "driver" else "synthetic",
                "n_queries": len(exact),
                "n_cells": len(cell_centroids),
                "rows": rows,
                "pca_rows": pca_rows,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
