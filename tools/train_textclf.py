"""Distill the Gopher repetition gate into a hashed char-3-gram LINEAR
model and freeze its INTEGER weights into functions/textclf_weights.py.

The recipe every large pipeline runs: an expensive multi-signal quality
gate (here the 5-signal doc_repetition_signals teacher — duplicate-word
fraction + four n-gram coverage signals, each a gram explode + shuffle)
is distilled into a fastText-shaped student — one linear scan over hashed
character trigrams — that a 100 TB ingest can afford on every document.
The TEACHER labels come from the committed doc_repetition_signals ORACLE
run in DuckDB, so this script has no Spark dependency and is reproducible
bit for bit (zero init, fixed iterations/learning rate, full-batch numpy
logistic regression).

Student features, all exact-integer computable at apply time:
  * mean hashed-trigram weights: counts[bucket]/total per bucket, where
    bucket = poly_hash(gram) % N_BUCKETS (the portable ``h*31+codepoint
    mod 1e9+7`` fold the dedup oracles share);
  * the char-level duplication fraction (total - distinct)/total.

Weights freeze as ``round(w * 2**16)`` int64. Multiplying the margin by
``total * 2**16`` clears every denominator, so the apply-path decision is
    margin_int = sum_g W[bucket(g)] + W_DUP*(total-distinct) + BIAS*total
an ORDER-INDEPENDENT exact int64 sum — the decision boundary can never
flip between engines the way a float dot product's last ulp can — and the
reported mean score divides two exact int64s (< 2^53), identical doubles
everywhere (operators/text.py::hashed_ngram_classifier).

Magnitude audit: |W| <= ~2^23, a document contributes ~n_chars gram terms,
so |margin_int| <= ~2^23 * (n_chars + 2) — int64-safe (and < 2^53 for the
exact double division) up to ~2^28 chars per document.

Run: python tools/train_textclf.py  (rewrites functions/textclf_weights.py)
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np

MOD = 1_000_000_007
BASE = 31
N_BUCKETS = 2048
SCALE = 1 << 16
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(
    os.path.dirname(__file__), "..",
    "crdb_changefeed_publisher_spark", "functions", "textclf_weights.py",
)


def bucket(gram: str) -> int:
    h = 0
    for ch in gram:
        h = (h * BASE + ord(ch)) % MOD
    return h % N_BUCKETS


def main() -> None:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from crdb_changefeed_publisher_spark import plans

    teacher = plans.get_spec("doc_repetition_signals")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    labels = dict(
        con.execute(
            f"SELECT doc_id, repetitive FROM ({teacher.oracle})"
        ).fetchall()
    )
    rows = con.execute("SELECT doc_id, text FROM documents ORDER BY doc_id").fetchall()

    n = len(rows)
    X = np.zeros((n, N_BUCKETS + 1))
    y = np.zeros(n)
    for r, (doc_id, text) in enumerate(rows):
        # strip ASCII space ONLY: the apply path and oracle normalize with
        # Spark/DuckDB trim(), which strips ' ' alone — Python str.strip()
        # strips all Unicode whitespace and would skew trained features
        # from applied features on tab/NBSP-padded text (r8 ADVICE)
        t = text.strip(" ").lower()
        grams = [t[i : i + 3] for i in range(len(t) - 2)]
        total = len(grams)
        counts = np.zeros(N_BUCKETS)
        for g in grams:
            counts[bucket(g)] += 1.0
        X[r, :N_BUCKETS] = counts / total
        X[r, N_BUCKETS] = (total - len(set(grams))) / total
        y[r] = 1.0 if labels[doc_id] else 0.0

    # full-batch logistic regression, deterministic
    w = np.zeros(N_BUCKETS + 1)
    b = 0.0
    lr, l2, iters = 30.0, 1e-6, 3000
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-np.clip(X @ w + b, -30, 30)))
        g = p - y
        w -= lr * (X.T @ g / n + l2 * w)
        b -= lr * g.mean()

    def metrics(wv, bv):
        pred = (X @ wv + bv) > 0
        truth = y > 0.5
        acc = float((pred == truth).mean())
        tp = float((pred & truth).sum())
        prec = tp / max(float(pred.sum()), 1.0)
        rec = tp / max(float(truth.sum()), 1.0)
        return acc, prec, rec

    acc, prec, rec = metrics(w, b)
    w_int = np.round(w * SCALE).astype(np.int64)
    b_int = int(round(b * SCALE))
    q_acc, q_prec, q_rec = metrics(w_int / SCALE, b_int / SCALE)

    nz = [(i, int(v)) for i, v in enumerate(w_int[:N_BUCKETS]) if v != 0]
    with open(OUT, "w") as fh:
        fh.write(
            '"""Frozen hashed char-3-gram repetition-classifier weights — generated\n'
            "by tools/train_textclf.py (deterministic numpy logistic regression,\n"
            "teacher = the doc_repetition_signals oracle at sf0.01; train acc\n"
            f"{acc:.4f} P {prec:.4f} R {rec:.4f}, quantized acc {q_acc:.4f} P "
            f"{q_prec:.4f} R {q_rec:.4f}, base rate {y.mean():.4f}).\n"
            "Integer weights = round(w * 2**16): the apply-path margin is exact\n"
            'int64 arithmetic, shared verbatim with the SQL oracle."""\n\n'
            f"N_BUCKETS = {N_BUCKETS}\n"
            f"SCALE = {SCALE}\n"
            f"BIAS_INT = {b_int}\n"
            f"W_DUP_INT = {int(w_int[N_BUCKETS])}\n"
            f"TRAIN_ACC = {q_acc:.4f}\n"
            "# bucket -> integer weight; buckets absent here weigh 0\n"
            "WEIGHTS_INT = {\n"
        )
        for i, v in nz:
            fh.write(f"    {i}: {v},\n")
        fh.write("}\n")
    print(
        f"wrote {OUT}: {len(nz)} nonzero of {N_BUCKETS} buckets, "
        f"acc {acc:.4f} P {prec:.4f} R {rec:.4f} "
        f"(quantized {q_acc:.4f}/{q_prec:.4f}/{q_rec:.4f}), "
        f"base rate {y.mean():.4f}, bias {b_int}, w_dup {int(w_int[N_BUCKETS])}"
    )


if __name__ == "__main__":
    main()
