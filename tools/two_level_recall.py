#!/usr/bin/env python
"""Recall point for the two-level trained ANN past the driver-RAM wall.

`ivf_dial_study.two_level_sweep` measures recall by loading the WHOLE
corpus into driver numpy — right at 20M vectors (5 GB of float32),
impossible at the eighth decade (102.4M vectors, 26 GB on disk and 3x
that in float64 working copies). The r12 verdict names the sidestep:
exact truth for a query SUBSAMPLE is one corpus scan per batch of
queries — linear, not quadratic — so the truth GEMM distributes as a
mapInPandas partial-top-k pass and only (nq x 5 x n_partitions) rows
ever reach the driver.

Phases (each timed, one JSON line appended to --out per run):

1. TRAIN (or --codebook-path to reuse a sliced build's scratch table):
   kmeans_train_two_level_sliced — the bounded-scratch trainer; the
   returned codebook is read back from its parquet scratch with pyarrow
   (numpy matrices, never 500k Python row objects on the driver).
2. TRUTH: one distributed corpus pass; per partition keep the running
   exact-cosine top-5 per query (float64 normalized, self excluded),
   then a driver merge of the per-partition candidates.
3. PROBE ANALYSIS: replicate the serve's probe rule in numpy — coarse
   top-c1 = n_probe_for(k1) by exact int64 distance (stable ties =
   lower cell id, the np.argsort(kind="stable") the operator itself
   uses), then those cells' subs by exact int64 distance under the
   (dist, cell, sub) tie order, top p2 = n_probe_for(k_total) — and
   score each truth neighbor's OPERATOR assignment (L1 argmin, then
   argmin over the winning cell's subs) against the probe set at
   p2/2, p2, 2*p2, 4*p2. With the rerank exact, candidate recall IS
   serve recall at the same dial, so the analysis prices the registered
   dial and the curve around it from one codebook + one truth pass.
   Scan fraction is exact from the codebook's n_members, not estimated.
4. --serve: additionally time the REAL in-memory operator
   (similarity.ivf_topk_two_level) end to end at the registered dial —
   the serve-side decade point (2M/20M measured in r12; this tool adds
   the eighth decade). Costs the one full-corpus cogroup exchange
   (~44 GB of shuffle scratch at 102.4M — check df first).

Usage:
  python tools/two_level_recall.py --sf-dir .scratch/testdata/sf5120emb \
      --scratch .scratch/two_level_cb_100m --n-slices 3 --nq 256 \
      --out docs/ivf_two_level_recall_100m_r13.json [--serve]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Iterator

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _read_codebook_np(path: str):
    """(cells, subs, C, n_members) as numpy from the scratch parquet —
    rows in (cell, sub) order."""
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["cell", "sub", "c", "n_members"])
    cells = t.column("cell").to_numpy()
    subs = t.column("sub").to_numpy()
    nm = t.column("n_members").to_numpy()
    flat = t.column("c").combine_chunks()
    C = np.asarray(flat.values, dtype=np.int64).reshape(len(cells), -1)
    order = np.lexsort((subs, cells))
    return cells[order], subs[order], C[order], nm[order]


def distributed_truth(emb, q_ids, Qn, id_col="vec_id", vec_col="embedding", k=5):
    """Exact cosine top-k per query over the full corpus: one scan, a
    per-partition running top-k, and an (nq * k * n_partitions)-row
    driver merge. Self-pairs excluded (the sweep's definition)."""
    import pandas as pd

    nq = len(q_ids)
    qn_rows = Qn  # (nq, d) float64 unit rows — closure-shipped, query-sized
    qid_arr = np.asarray(q_ids)

    def part(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        best_sim = np.full((nq, k), -2.0)
        best_id = np.full((nq, k), -1, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            X /= np.linalg.norm(X, axis=1, keepdims=True)
            S = qn_rows @ X.T  # (nq, batch)
            S[np.equal.outer(qid_arr, ids)] = -2.0  # self
            kk = min(k, S.shape[1])
            top = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
            cand_sim = np.concatenate(
                [best_sim, S[np.arange(nq)[:, None], top]], axis=1
            )
            cand_id = np.concatenate([best_id, ids[top]], axis=1)
            keep = np.argpartition(-cand_sim, k - 1, axis=1)[:, :k]
            best_sim = cand_sim[np.arange(nq)[:, None], keep]
            best_id = cand_id[np.arange(nq)[:, None], keep]
        mask = best_id.ravel() >= 0
        yield pd.DataFrame(
            {
                "q": np.repeat(np.arange(nq), k)[mask],
                "nb": best_id.ravel()[mask],
                "sim": best_sim.ravel()[mask],
            }
        )

    rows = (
        emb.select(id_col, vec_col)
        .mapInPandas(part, "q int, nb long, sim double")
        .collect()
    )
    truth = np.full((nq, k), -1, dtype=np.int64)
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(int(r.q), []).append((-float(r.sim), int(r.nb)))
    for qi, cands in by_q.items():
        cands.sort()
        truth[qi] = [nb for _, nb in cands[:k]]
    return truth


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--scratch", required=True,
                    help="sliced trainer codebook table (built or reused)")
    ap.add_argument("--n-slices", type=int, default=3)
    ap.add_argument("--nq", type=int, default=256)
    ap.add_argument("--codebook-path", default=None,
                    help="reuse an existing sliced build instead of training")
    ap.add_argument("--serve", action="store_true",
                    help="also time the in-memory operator serve "
                         "(full-corpus exchange — needs the disk)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from crdb_changefeed_publisher_spark.operators import similarity
    from crdb_changefeed_publisher_spark.operators.linalg import (
        _int_sq_dists,
        _quantize_np,
        kmeans_train_two_level_sliced,
        n_probe_for,
    )
    from crdb_changefeed_publisher_spark.plans.llm import KMEANS_SCALE
    from crdb_changefeed_publisher_spark.session import get_spark
    from crdb_changefeed_publisher_spark.tables import load_table

    spark = get_spark("two-level-recall")
    emb = load_table(spark, args.sf_dir, "embeddings")
    n = emb.count()
    result: dict = {"n": int(n), "nq_target": args.nq}

    if args.codebook_path:
        cb_path = args.codebook_path
        with open(f"{cb_path}.cents1.json") as fh:
            cents1 = json.load(fh)["cents1"]
        result["train_sec"] = None
    else:
        t0 = time.monotonic()
        cents1, codebook_df = kmeans_train_two_level_sliced(
            emb, args.scratch, n_slices=args.n_slices, n=n,
            scale=KMEANS_SCALE,
        )
        result["train_sec"] = round(time.monotonic() - t0, 1)
        cb_path = args.scratch
        tmp = f"{cb_path}.cents1-{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump({"scale": KMEANS_SCALE, "cents1": cents1}, fh)
        os.replace(tmp, f"{cb_path}.cents1.json")

    cells, subs, C, nm = _read_codebook_np(cb_path)
    C1 = np.asarray(cents1, dtype=np.int64)
    k1, k_total = len(C1), len(C)
    result.update(
        k1=int(k1), k_total=int(k_total),
        members_total=int(nm.sum()), members_max=int(nm.max()),
    )
    print(json.dumps(result), flush=True)

    # ---- queries: a deterministic id-residue subsample
    qmod = max(1, n // args.nq)
    qdf = emb.filter((emb.vec_id % qmod) == 0).select("vec_id", "embedding")
    qrows = qdf.collect()
    q_ids = np.array([int(r.vec_id) for r in qrows], dtype=np.int64)
    Xq = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in qrows])
    Qn = Xq / np.linalg.norm(Xq, axis=1, keepdims=True)
    nq = len(q_ids)
    result["nq"] = int(nq)

    t0 = time.monotonic()
    truth = distributed_truth(emb, q_ids, Qn)
    result["truth_sec"] = round(time.monotonic() - t0, 1)
    print(json.dumps({"phase": "truth", "sec": result["truth_sec"]}), flush=True)

    # ---- truth neighbors' vectors (nq*5 rows) -> operator assignment
    nb_ids = sorted({int(x) for x in truth.ravel() if x >= 0})
    nb_rows = emb.filter(emb.vec_id.isin(nb_ids)).select(
        "vec_id", "embedding"
    ).collect()
    nb_vec = {int(r.vec_id): np.asarray(r.embedding) for r in nb_rows}
    Qnb = _quantize_np([nb_vec[i] for i in nb_ids], KMEANS_SCALE)
    l1 = _int_sq_dists(Qnb, C1).argmin(axis=1)  # first-min = lower cell
    # per-cell sub matrices in sub order (rows already lexsorted)
    cell_start = np.searchsorted(cells, np.arange(k1), side="left")
    cell_end = np.searchsorted(cells, np.arange(k1), side="right")
    nb_flat = np.empty(len(nb_ids), dtype=np.int64)
    for i, c in enumerate(l1):
        lo, hi = cell_start[c], cell_end[c]
        d2 = _int_sq_dists(Qnb[i: i + 1], C[lo:hi])[0]
        nb_flat[i] = lo + d2.argmin()  # first-min = lower sub id
    flat_of = {nb: int(f) for nb, f in zip(nb_ids, nb_flat)}

    # ---- probe analysis at the operator rule
    c1_probe = min(n_probe_for(k1), k1)
    p2 = n_probe_for(k_total)
    Qq = _quantize_np(list(Xq), KMEANS_SCALE)
    d1 = _int_sq_dists(Qq, C1)
    coarse = np.argsort(d1, axis=1, kind="stable")[:, :c1_probe]
    points = []
    for mult, p in [(0.5, max(3, p2 // 2)), (1, p2), (2, 2 * p2), (4, 4 * p2)]:
        hits, scanned = 0, 0
        for qi in range(nq):
            idx = np.concatenate(
                [np.arange(cell_start[c], cell_end[c]) for c in coarse[qi]]
            )
            d2 = _int_sq_dists(Qq[qi: qi + 1], C[idx])[0]
            order = np.lexsort((subs[idx], cells[idx], d2))
            probe = set(idx[order[: min(p, len(idx))]].tolist())
            scanned += int(nm[list(probe)].sum())
            for nb in truth[qi]:
                if nb >= 0 and flat_of[int(nb)] in probe:
                    hits += 1
        points.append(
            {
                "p2_mult": mult,
                "n_probe": int(p),
                "scan_fraction": round(scanned / (nq * n), 5),
                "recall_at_5": round(hits / (5 * nq), 4),
            }
        )
        print(json.dumps(points[-1]), flush=True)
    result["c1_probe"] = int(c1_probe)
    result["p2"] = int(p2)
    result["points"] = points

    if args.serve:
        codebook_df = spark.read.parquet(cb_path)
        t0 = time.monotonic()
        try:
            out = similarity.ivf_topk_two_level(
                qdf, emb, cents1, codebook_df, k=6, scale=KMEANS_SCALE
            )
            got = [(int(r.query_id), int(r.neighbor_id)) for r in out.collect()]
        except Exception as exc:  # a disk-wall serve must not lose the
            # train/recall measurements already in `result`
            result["serve_error"] = f"{type(exc).__name__}: {exc}"[:400]
            result["serve_failed_after_sec"] = round(time.monotonic() - t0, 1)
            print(json.dumps({"phase": "serve", "error": result["serve_error"],
                              "sec": result["serve_failed_after_sec"]}),
                  flush=True)
        else:
            result["serve_sec"] = round(time.monotonic() - t0, 1)
            result["serve_rows"] = len(got)
            # operator-true recall: k=6 absorbs the self-hit the truth
            # pass excludes; count truth pairs the serve returned
            truth_pairs = {
                (int(q_ids[qi]), int(nb))
                for qi in range(nq)
                for nb in truth[qi]
                if nb >= 0
            }
            hit = len(truth_pairs & set(got))
            result["serve_recall_at_5"] = round(
                hit / max(1, len(truth_pairs)), 4
            )
            print(json.dumps({"phase": "serve", "sec": result["serve_sec"],
                              "rows": len(got),
                              "recall_at_5": result["serve_recall_at_5"]}),
                  flush=True)

    if args.out:
        with open(args.out, "a") as fh:
            fh.write(json.dumps(result) + "\n")
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
