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


# ---------------------------------------------------------------------------
# Span/edit-truth tier family (r11 verdict #4): the Zipfian realism corpus
# certifies CANDIDATE recall for set-similarity (MinHash) only. This second
# family plants the other two kinds of ground truth production dedup needs
# verified on realistic data, in two tables per tier so each operator runs
# against exactly its own truth:
#
# * documents_spans.parquet + truth_spans.parquet — verbatim shared runs
#   with KNOWN word boundaries for ExactSubstr EXCISION-EXACTNESS: groups
#   of 2-3 docs share one L-word run (12-30 words, sampled fresh per
#   group), flanked by per-member UNIQUE guard words so no 8-gram
#   straddles the boundary in two docs — the excision's expected output
#   is therefore exactly the planted coverage, recorded per doc as
#   (span_start, span_len, kept_text). Background docs share no 8-gram
#   (50k-word vocab; accidental-dup probability ~1e-8 at this tier, and
#   the fixed seed makes the verified corpus permanent).
#
# * documents_edits.parquet + truth_edit_pairs.parquet — CHARACTER-
#   mutation clones for PassJoin's exact-recall guarantee: each clone
#   applies 1-4 random single-char edits (sub/ins/del, letters only, so
#   normalized_link_key is the identity) to a distinct base doc, hence
#   ed(base, clone) <= 4 by construction while unrelated docs sit
#   hundreds of edits apart — the operator's output pair set must EQUAL
#   the planted set (recall AND precision).
#
# Deterministic end to end (own seed; the original build_corpus is
# byte-frozen — its tiers' committed fingerprints must not move).
# ---------------------------------------------------------------------------

SPANEDIT_SEED = 20260817
SPAN_GROUP_FRAC = 0.12  # fraction of span-table docs that are group members
SPAN_LEN_LO, SPAN_LEN_HI = 12, 30
EDIT_CLONE_FRAC = 0.2  # fraction of edit-table docs that are clones
EDIT_MAX = 4


def _base26(n: int) -> str:
    s = ""
    while True:
        s = chr(ord("a") + n % 26) + s
        n //= 26
        if n == 0:
            return s


def _background_tokens(rng, cdf, n_docs: int) -> list:
    lens = rng.integers(LEN_LO, LEN_HI + 1, size=n_docs)
    total = int(lens.sum())
    idx = np.searchsorted(cdf, rng.random(total)).astype(np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)])
    return [idx[offs[i]: offs[i + 1]] for i in range(n_docs)]


def build_spanedit_corpus(n_docs: int, out_dir: str) -> dict:
    """Write the span/edit tier: documents_spans.parquet +
    truth_spans.parquet + documents_edits.parquet +
    truth_edit_pairs.parquet. `n_docs` sizes EACH table."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SPANEDIT_SEED)
    vocab = _make_vocab(rng)
    vocab_set = set(vocab)
    cdf = _zipf_cdf()

    # ---- spans table -------------------------------------------------
    toks = _background_tokens(rng, cdf, n_docs)
    n_members = int(n_docs * SPAN_GROUP_FRAC)
    member_ids = rng.choice(n_docs, size=n_members, replace=False)
    member_ids.sort()
    span_texts: dict[int, str] = {}
    truth = {"doc_id": [], "span_start": [], "span_len": [], "kept_text": []}
    guard_n = 0
    pos = 0
    while pos < n_members:
        m = int(rng.integers(2, 4))  # group of 2 or 3
        group = member_ids[pos: pos + m]
        if len(group) < 2:
            break
        pos += m
        L = int(rng.integers(SPAN_LEN_LO, SPAN_LEN_HI + 1))
        run = np.searchsorted(cdf, rng.random(L)).astype(np.int64)
        run_words = list(vocab[run])
        for d in group:
            base = list(vocab[toks[int(d)]])
            p = int(rng.integers(1, len(base)))  # guards stay interior
            guards = []
            while len(guards) < 2:
                g = "zq" + _base26(guard_n)
                guard_n += 1
                if g not in vocab_set:
                    guards.append(g)
            words = base[:p] + [guards[0]] + run_words + [guards[1]] + base[p:]
            span_texts[int(d)] = " ".join(words)
            start = p + 2  # 1-based; base[:p] + left guard precede the run
            kept = base[:p] + [guards[0]] + [guards[1]] + base[p:]
            truth["doc_id"].append(int(d))
            truth["span_start"].append(start)
            truth["span_len"].append(L)
            truth["kept_text"].append(" ".join(kept))

    span_docs = [
        span_texts.get(i, " ".join(vocab[toks[i]])) for i in range(n_docs)
    ]

    # ---- edits table -------------------------------------------------
    n_clone = int(n_docs * EDIT_CLONE_FRAC)
    n_base = n_docs - n_clone
    etoks = _background_tokens(rng, cdf, n_base)
    edit_docs = [" ".join(vocab[t]) for t in etoks]
    bases = rng.choice(n_base, size=n_clone, replace=False)
    epairs = {"doc_a": [], "doc_b": [], "n_edits": []}
    letters = "abcdefghijklmnopqrstuvwxyz"
    for j in range(n_clone):
        b = int(bases[j])
        s = list(edit_docs[b])
        e = int(rng.integers(1, EDIT_MAX + 1))
        for _ in range(e):
            op = int(rng.integers(0, 3))
            if op == 0 and s:  # substitute
                s[int(rng.integers(0, len(s)))] = letters[int(rng.integers(0, 26))]
            elif op == 1:  # insert
                s.insert(int(rng.integers(0, len(s) + 1)),
                         letters[int(rng.integers(0, 26))])
            elif s:  # delete
                del s[int(rng.integers(0, len(s)))]
        doc_id = n_base + j
        edit_docs.append("".join(s))
        epairs["doc_a"].append(b)
        epairs["doc_b"].append(doc_id)
        epairs["n_edits"].append(e)

    def _write_docs(name: str, texts: list) -> None:
        n = len(texts)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                    "text": pa.array(texts, type=pa.string()),
                    "lang": pa.array(["en"] * n),
                    "source": pa.array([f"src{i % 5}" for i in range(n)]),
                    "n_chars": pa.array(
                        np.fromiter((len(t) for t in texts), dtype=np.int64,
                                    count=n)
                    ),
                }
            ),
            os.path.join(out_dir, name),
        )

    _write_docs("documents_spans.parquet", span_docs)
    _write_docs("documents_edits.parquet", edit_docs)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(truth["doc_id"], type=pa.int64()),
                "span_start": pa.array(truth["span_start"], type=pa.int32()),
                "span_len": pa.array(truth["span_len"], type=pa.int32()),
                "kept_text": pa.array(truth["kept_text"], type=pa.string()),
            }
        ),
        os.path.join(out_dir, "truth_spans.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "doc_a": pa.array(epairs["doc_a"], type=pa.int64()),
                "doc_b": pa.array(epairs["doc_b"], type=pa.int64()),
                "n_edits": pa.array(epairs["n_edits"], type=pa.int32()),
            }
        ),
        os.path.join(out_dir, "truth_edit_pairs.parquet"),
    )
    return {
        "n_docs": n_docs,
        "n_truth_spans": len(truth["doc_id"]),
        "n_truth_edit_pairs": len(epairs["doc_a"]),
    }


# ---------------------------------------------------------------------------
# Incremental-ingest shard family (r12 verdict #4): a fresh shard arriving
# AGAINST an existing realism tier, with planted cross-shard ground truth —
# the fixture that certifies the incremental dedup path
# (operators/dedup.py::incremental_dedup_report probing the tier's
# PERSISTED content/band indexes) the way truth_pairs certifies the batch
# path. Per shard doc the truth table records its expected admission class:
#
# * 'exact'  — verbatim copy of a parent-tier document (content-hash
#   recall is deterministic: every one MUST classify exact);
# * 'near'   — clone of a parent-tier BASE document under the SAME edit
#   model as the tier's own planted clones (SUBST_P per-word substitution,
#   >= 1 edit forced so the label can never collapse into 'exact') — the
#   tier's >= 0.85 banded-recall floor therefore transfers verbatim;
# * 'new'    — fresh Zipfian background text over the same vocabulary
#   (shares frequent words/shingles with the corpus, as a real shard
#   would — the honest false-positive load for the band screen).
#
# A slice of the 'new' docs is duplicated WITHIN the shard (dup_of points
# at the copied shard doc) so within-shard keep/n_copies accounting is
# certified in the same pass. Deterministic (own seed); shard doc_ids are
# offset by SHARD_ID_OFFSET so they can never collide with tier ids.
# ---------------------------------------------------------------------------

SHARD_SEED = 20260818
SHARD_EXACT_FRAC = 0.10
SHARD_NEAR_FRAC = 0.15
SHARD_INTRA_DUP_FRAC = 0.05
SHARD_ID_OFFSET = 10_000_000


def build_shard_corpus(n_docs: int, parent_dir: str, out_dir: str) -> dict:
    """Write shard_documents.parquet + truth_shard.parquet (doc_id,
    expected, parent_id, dup_of) for a `n_docs` shard against the tier at
    `parent_dir`."""
    os.makedirs(out_dir, exist_ok=True)
    parent = pq.read_table(
        os.path.join(parent_dir, "documents.parquet"), columns=["text"]
    )
    parent_texts = parent.column("text").to_pylist()
    n_parent = len(parent_texts)
    n_parent_base = int(n_parent * (1.0 - CLONE_FRAC))

    # the tier's vocabulary/frequency model, reproduced deterministically
    # (same construction as build_corpus — _make_vocab consumes only its
    # own rng draws)
    vocab = _make_vocab(np.random.default_rng(SEED))
    cdf = _zipf_cdf()
    rng = np.random.default_rng(SHARD_SEED)

    n_exact = int(n_docs * SHARD_EXACT_FRAC)
    n_near = int(n_docs * SHARD_NEAR_FRAC)
    n_intra = int(n_docs * SHARD_INTRA_DUP_FRAC)
    n_new = n_docs - n_exact - n_near - n_intra

    texts: list[str] = []
    expected: list[str] = []
    parent_id: list[int] = []
    dup_of: list[int] = []

    for p in rng.integers(0, n_parent, size=n_exact):
        texts.append(parent_texts[int(p)])
        expected.append("exact")
        parent_id.append(int(p))
        dup_of.append(-1)

    for p in rng.integers(0, n_parent_base, size=n_near):
        words = np.array(parent_texts[int(p)].split(" "), dtype=object)
        mask = rng.random(len(words)) < SUBST_P
        if not mask.any():
            mask[int(rng.integers(0, len(words)))] = True
        repl = vocab[np.searchsorted(cdf, rng.random(int(mask.sum())))]
        words[mask] = repl
        text = " ".join(words)
        if text == parent_texts[int(p)]:
            # every substitution drew the original word back — force one
            # real edit so the planted label stays 'near'
            i = int(np.nonzero(mask)[0][0])
            j = (int(np.searchsorted(cdf, rng.random())) + 1) % len(vocab)
            if vocab[j] == words[i]:
                j = (j + 1) % len(vocab)
            words[i] = vocab[j]
            text = " ".join(words)
        texts.append(text)
        expected.append("near")
        parent_id.append(int(p))
        dup_of.append(-1)

    lens = rng.integers(LEN_LO, LEN_HI + 1, size=n_new)
    total = int(lens.sum())
    idx = np.searchsorted(cdf, rng.random(total)).astype(np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)])
    first_new = len(texts)
    for i in range(n_new):
        texts.append(" ".join(vocab[idx[offs[i]: offs[i + 1]]]))
        expected.append("new")
        parent_id.append(-1)
        dup_of.append(-1)

    for s in rng.integers(first_new, first_new + n_new, size=n_intra):
        texts.append(texts[int(s)])
        expected.append("new")
        parent_id.append(-1)
        dup_of.append(int(s) + SHARD_ID_OFFSET)

    ids = np.arange(n_docs, dtype=np.int64) + SHARD_ID_OFFSET
    n_chars = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n_docs)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids),
                "text": pa.array(texts, type=pa.string()),
                "lang": pa.array(["en"] * n_docs),
                "source": pa.array([f"shard{i % 3}" for i in range(n_docs)]),
                "n_chars": pa.array(n_chars),
            }
        ),
        os.path.join(out_dir, "shard_documents.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids),
                "expected": pa.array(expected, type=pa.string()),
                "parent_id": pa.array(parent_id, type=pa.int64()),
                "dup_of": pa.array(dup_of, type=pa.int64()),
            }
        ),
        os.path.join(out_dir, "truth_shard.parquet"),
    )
    return {"n_docs": n_docs, "n_exact": n_exact, "n_near": n_near,
            "n_new": n_new, "n_intra": n_intra}


def ensure_shard_tier(n_docs: int, parent_n: int) -> str:
    """Path to the shard tier for `n_docs` against the `parent_n` realism
    tier, building both if missing."""
    parent_dir = ensure_tier(parent_n)
    out_dir = os.path.join(REALCORPUS_ROOT, f"shard{n_docs}_of_n{parent_n}")
    have = all(
        os.path.exists(os.path.join(out_dir, f))
        for f in ("shard_documents.parquet", "truth_shard.parquet")
    )
    if not have:
        build_shard_corpus(n_docs, parent_dir, out_dir)
    return out_dir


def ensure_spanedit_tier(n_docs: int) -> str:
    """Path to the span/edit tier for `n_docs`, building if missing."""
    out_dir = os.path.join(REALCORPUS_ROOT, f"se{n_docs}")
    have = all(
        os.path.exists(os.path.join(out_dir, f))
        for f in (
            "documents_spans.parquet",
            "documents_edits.parquet",
            "truth_spans.parquet",
            "truth_edit_pairs.parquet",
        )
    )
    if not have:
        build_spanedit_corpus(n_docs, out_dir)
    return out_dir
