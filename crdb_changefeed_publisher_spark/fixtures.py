"""Realistic-corpus fixture: a Zipfian document corpus with PLANTED
near-dup ground truth, promoted from measurement tooling to a standing
verified fixture (r10 verdict #2).

The driver fixtures (/root/testdata/sf*) have a 31-word vocabulary, so at
scale their qualifying near-dup pair set is itself quadratic — the corpus
saturates before the operators do (docs/SCALE.md "Fifth decade"). This
generator is the opposite regime, shaped like real data:

* 50,000-word Zipfian vocabulary (exponent ~1.07, like natural language);
* ~85% unique documents of 60-180 words, ~15% planted clones (3% per-word
  substitution — word-3-gram Jaccard ~0.8, well over the 0.2 threshold);
* truth_pairs.parquet records every planted near-dup pair, so RECALL is
  measurable against ground truth — the one thing no driver fixture or
  TPC-H table offers.

Deterministic end to end (fixed seed, no wall clock): generating the same
tier twice is bit-identical (tests/test_sixth_decade_tools.py), which is
what lets `.scratch/realcorpus/n*` act as a standing fixture — any
checkout rebuilds the exact corpus the committed oracles were verified on.

Layout per tier directory: documents.parquet (driver documents schema:
doc_id, text, lang, source, n_chars) + truth_pairs.parquet (doc_a, doc_b).

Moved here from tools/near_dup_realism.py (which now imports it) so the
spec layer (plans/realism.py) can lazily build tiers without depending on
the tools package.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB_SIZE = 50_000
CLONE_FRAC = 0.15  # fraction of docs that are near-dup clones of a base doc
SUBST_P = 0.03  # per-word substitution rate in a clone
LEN_LO, LEN_HI = 60, 180  # words per document
SEED = 20260816

_LETTERS = np.array(list("abcdefghijklmnopqrstuvwxyz"))

# repo root (this file lives at <root>/crdb_changefeed_publisher_spark/)
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REALCORPUS_ROOT = os.path.join(_REPO_ROOT, ".scratch", "realcorpus")


def _make_vocab(rng: np.random.Generator) -> np.ndarray:
    """50k distinct pseudo-words, lengths 3-9, deterministic."""
    lens = rng.integers(3, 10, size=VOCAB_SIZE)
    words, seen = [], set()
    for i in range(VOCAB_SIZE):
        w = "".join(rng.choice(_LETTERS, size=int(lens[i])))
        while w in seen:
            w += rng.choice(_LETTERS)
        seen.add(w)
        words.append(w)
    return np.array(words, dtype=object)


def _zipf_cdf() -> np.ndarray:
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    w = 1.0 / (ranks + 2.7) ** 1.07
    return np.cumsum(w / w.sum())


def build_corpus(n_docs: int, out_dir: str) -> dict:
    """Write documents.parquet (fixture schema) + truth_pairs.parquet.

    Returns {"n_docs", "n_truth_pairs"}. Clone clusters: each clone picks a
    base doc; base + clones are all mutually near-dup, counted pair-by-pair
    below.
    """
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED)
    vocab = _make_vocab(rng)
    cdf = _zipf_cdf()

    n_base = int(n_docs * (1.0 - CLONE_FRAC))
    n_clone = n_docs - n_base

    lens = rng.integers(LEN_LO, LEN_HI + 1, size=n_base)
    total = int(lens.sum())
    idx = np.searchsorted(cdf, rng.random(total)).astype(np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)])

    base_tokens = [idx[offs[i]: offs[i + 1]] for i in range(n_base)]
    parents = rng.integers(0, n_base, size=n_clone)

    texts: list[str] = []
    for toks in base_tokens:
        texts.append(" ".join(vocab[toks]))
    truth_a: list[int] = []
    truth_b: list[int] = []
    # clones are appended after the base docs; doc_id == row index
    by_parent: dict[int, list[int]] = {}
    for j in range(n_clone):
        p = int(parents[j])
        toks = base_tokens[p].copy()
        mask = rng.random(toks.shape[0]) < SUBST_P
        if mask.any():
            toks[mask] = np.searchsorted(cdf, rng.random(int(mask.sum())))
        doc_id = n_base + j
        texts.append(" ".join(vocab[toks]))
        sibs = by_parent.setdefault(p, [p])
        for s in sibs:
            truth_a.append(min(s, doc_id))
            truth_b.append(max(s, doc_id))
        sibs.append(doc_id)

    n_chars = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n_docs)
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en"] * n_docs),
            "source": pa.array([f"src{i % 5}" for i in range(n_docs)]),
            "n_chars": pa.array(n_chars),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "documents.parquet"))
    pq.write_table(
        pa.table(
            {
                "doc_a": pa.array(truth_a, type=pa.int64()),
                "doc_b": pa.array(truth_b, type=pa.int64()),
            }
        ),
        os.path.join(out_dir, "truth_pairs.parquet"),
    )
    return {"n_docs": n_docs, "n_truth_pairs": len(truth_a)}


def ensure_tier(n_docs: int) -> str:
    """Path to the tier directory for `n_docs`, building it if missing
    (deterministic, so a fresh checkout reproduces the committed-oracle
    corpus exactly). The 500k tier builds in ~20 s; existing tiers are
    trusted as-is (determinism is pinned by test)."""
    out_dir = os.path.join(REALCORPUS_ROOT, f"n{n_docs}")
    have = all(
        os.path.exists(os.path.join(out_dir, f))
        for f in ("documents.parquet", "truth_pairs.parquet")
    )
    if not have:
        build_corpus(n_docs, out_dir)
    return out_dir
