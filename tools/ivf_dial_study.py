#!/usr/bin/env python
"""Reproduce the IVF probe-dial measurements behind linalg.n_probe_for
(docs/SCALE.md "IVF probe dial"; r8 verdict #1 — the fixed-n_probe `weak`).

Two studies, one JSON line each:

1. --study isotropic (needs an embeddings fixture dir, default the sf1
   stress tier): sweep (n_probe, n_assign) over the in-engine-trained
   cells and report candidate-set recall@5 vs exact cosine truth. The
   headline result: recall collapses onto ONE curve in scan fraction
   (probes and multi-assignment are interchangeable at equal fraction) —
   the information limit of cell-blocking on iid noise, which is why no
   sublinear-cost dial can hold isotropic recall level and ~sqrt(k)
   probes (fraction decay 1/sqrt(n) at sqrt(n) cost) is the chosen
   frontier point.

2. --study clustered: the 16-cluster fixture (tools/ann_recall.py
   convention: unit-norm centers + 0.35 noise, seed 11) at n=2000 and
   n=20000 through the REAL pipeline — in-engine kmeans_train with both
   dials self-sized (kmeans_k_for / n_probe_for) — demonstrating LEVEL
   recall (measured 1.000 at both scales: 3/8 then 12/128 cells probed)
   where the corpus has structure.

Candidate-set recall equals end-to-end recall@k: exact cosine rerank
keeps any true top-k neighbor that is a candidate.

Usage: python tools/ivf_dial_study.py [--study isotropic|clustered|both]
       [--sf-dir /root/repo/.scratch/testdata/sf1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def isotropic_sweep(spark, sf_dir: str) -> dict:
    import numpy as np

    from crdb_changefeed_publisher_spark.operators.linalg import (
        _int_sq_dists,
        kmeans_k_for,
        n_probe_for,
    )
    from crdb_changefeed_publisher_spark.plans.llm import KMEANS_SCALE, _kmeans_cents
    from crdb_changefeed_publisher_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy()
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    Q = np.floor(X * KMEANS_SCALE).astype(np.int64)
    C = np.asarray(_kmeans_cents(spark, sf_dir), dtype=np.int64)
    k = len(C)
    cell_order = np.argsort(_int_sq_dists(Q, C), axis=1, kind="stable")
    qidx = np.where(ids % 25 == 0)[0]
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn[qidx] @ Xn.T
    S[np.arange(len(qidx)), qidx] = -2.0  # exclude self
    truth = np.argsort(-S, axis=1)[:, :5]
    points = []
    for n_assign in (1, 2, 3):
        acell = cell_order[:, :n_assign]
        for p in (3, 6, 12, 16, 23, 32, 64):
            if p > k:
                continue
            qcells = cell_order[qidx, :p]
            hits = 0
            for qi in range(len(qidx)):
                probed = set(qcells[qi])
                for nb in truth[qi]:
                    if any(c in probed for c in acell[nb]):
                        hits += 1
            points.append(
                {
                    "n_assign": n_assign,
                    "n_probe": p,
                    "scan_fraction": round(p / k * n_assign, 4),
                    "recall_at_5": round(hits / (5 * len(qidx)), 4),
                }
            )
    return {
        "n": int(len(ids)),
        "k": k,
        "dial_n_probe": n_probe_for(k),
        "dial_k": kmeans_k_for(len(ids)),
        "n_queries": int(len(qidx)),
        "points": points,
    }


def clustered_fixture(spark, n: int, dim: int = 64, n_clusters: int = 16,
                      noise: float = 0.35, seed: int = 11):
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, n_clusters, n)
    pts = centers[labels] + noise * rng.standard_normal((n, dim)) / (dim**0.5)
    return spark.createDataFrame(
        [(int(i), [float(round(x, 4)) for x in pts[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )


def clustered_level(spark) -> list[dict]:
    from pyspark.sql import functions as F

    from crdb_changefeed_publisher_spark.operators import similarity
    from crdb_changefeed_publisher_spark.operators.linalg import (
        kmeans_k_for,
        kmeans_train,
        n_probe_for,
    )
    from crdb_changefeed_publisher_spark.plans.llm import KMEANS_SCALE

    out = []
    for n in (2000, 20000):
        emb = clustered_fixture(spark, n)
        k = kmeans_k_for(n)
        cents = kmeans_train(emb, k=k, n_iters=3, scale=KMEANS_SCALE)
        q = emb.filter(F.col("vec_id") % (n // 80) == 0)
        ivf = similarity.ivf_topk_trained(q, emb, cents, k=5, scale=KMEANS_SCALE)
        bf = similarity.brute_force_topk(q, emb, k=5)
        got = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
        truth = {(r.query_id, r.neighbor_id) for r in bf.collect()}
        out.append(
            {
                "n": n,
                "k": k,
                "n_probe": n_probe_for(k),
                "scan_fraction": round(n_probe_for(k) / k, 4),
                "recall_at_5": round(len(got & truth) / len(truth), 4),
            }
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--study", default="both",
                    choices=["isotropic", "clustered", "both"])
    ap.add_argument("--sf-dir", default="/root/repo/.scratch/testdata/sf1")
    args = ap.parse_args()

    from crdb_changefeed_publisher_spark.session import get_spark

    spark = get_spark("ivf-dial-study")
    result: dict = {}
    if args.study in ("isotropic", "both"):
        result["isotropic"] = isotropic_sweep(spark, args.sf_dir)
    if args.study in ("clustered", "both"):
        result["clustered"] = clustered_level(spark)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
