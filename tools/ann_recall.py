#!/usr/bin/env python
"""Reproduce the ANN recall-vs-scan-fraction numbers cited in docs/SCALE.md.

For each n_probe in 1..N_CELLS: run learned-codebook IVF and IVF-PQ against
exact brute-force cosine top-k on the same queries, report recall@k and the
scan fraction (probed cells / total cells). Prints ONE JSON line.

Usage: python tools/ann_recall.py [--sf-dir /root/testdata/sf0.01] [--k 5]
       [--probes 1,2,4,8,16]
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--probes", default="1,2,4,8,16")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from crdb_changefeed_publisher_spark.functions import codebooks as cb
    from crdb_changefeed_publisher_spark.operators import similarity
    from crdb_changefeed_publisher_spark.session import get_spark
    from crdb_changefeed_publisher_spark.tables import load_table

    spark = get_spark("ann_recall")
    emb = load_table(spark, args.sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 25 == 0)

    exact = topk_set(similarity.brute_force_topk(queries, emb, k=args.k))
    encoded = similarity.encode_learned(emb, cb.CELL_CENTROIDS, cb.PQ_CODEBOOKS).persist()

    rows = []
    for n_probe in [int(p) for p in args.probes.split(",")]:
        ivf = topk_set(
            similarity.ivf_topk(
                queries, emb, k=args.k, n_probe=n_probe,
                cell_centroids=cb.CELL_CENTROIDS, encoded=encoded,
            )
        )
        ivfpq = topk_set(
            similarity.ivf_pq_topk(
                queries, emb, k=args.k, n_probe=n_probe,
                cell_centroids=cb.CELL_CENTROIDS, codebooks=cb.PQ_CODEBOOKS,
                encoded=encoded,
            )
        )
        rows.append(
            {
                "n_probe": n_probe,
                "scan_fraction": round(n_probe / len(cb.CELL_CENTROIDS), 4),
                "ivf_recall": recall(ivf, exact),
                "ivfpq_recall": recall(ivfpq, exact),
                "ivfpq_vs_ivf": recall(ivfpq, ivf),
            }
        )
    print(
        json.dumps(
            {
                "metric": "ann_recall_at_k",
                "k": args.k,
                "sf_dir": args.sf_dir,
                "n_queries": len(exact),
                "n_cells": len(cb.CELL_CENTROIDS),
                "rows": rows,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
