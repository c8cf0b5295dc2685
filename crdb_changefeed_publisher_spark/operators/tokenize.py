"""BPE tokenizer training + application over a document corpus.

The classic byte-pair-encoding pipeline (Sennrich et al. 2016, the public
algorithm every LLM tokenizer descends from), factored the way it actually
scales:

- ``word_frequencies``: the ONLY corpus-sized stage — one distributed
  explode + partial-agg word count. 100 TB of text reduces to a vocabulary
  of distinct words, which is Zipf-bounded and tiny by comparison.
- ``learn_bpe``: merge learning runs on that bounded word-frequency table
  (bounded driver collect with an explicit cap + guard, same posture as the
  union-find fast path in operators/dedup.py): repeatedly count adjacent
  symbol pairs weighted by word frequency and merge the most frequent pair.
  Deterministic: ties break on the lexicographically smallest pair, so the
  same corpus always learns the same merges (reproducible tokenizer
  artifacts — the property checkpointed training depends on).
- ``apply_bpe``: tokenization is per-row and embarrassingly parallel —
  Arrow-batched mapInPandas with a per-batch memo over distinct words
  (Zipf again: a batch of documents repeats few distinct words), greedy
  lowest-merge-rank application exactly like the reference algorithm.

Merges are plain ``list[tuple[str, str]]`` — freeze them as literals (the
codebooks pattern) to pin a tokenizer version.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"  # end-of-word marker: merges never cross word boundaries
MAX_VOCAB_COLLECT = 2_000_000  # ~tens of MB of words; guard like dedup's edge cap


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct words with corpus frequencies — the one corpus-sized pass."""
    return (
        docs.select(F.explode(F.split(F.trim(F.col(text_col)), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (END,)


def learn_bpe(docs: DataFrame, n_merges: int, text_col: str = "text") -> list[tuple[str, str]]:
    """Learn `n_merges` BPE merges from the corpus. Deterministic
    (count desc, pair asc tiebreak); stops early when no pair repeats."""
    rows = word_frequencies(docs, text_col).limit(MAX_VOCAB_COLLECT + 1).collect()
    if len(rows) > MAX_VOCAB_COLLECT:
        raise ValueError(
            f"vocabulary exceeds MAX_VOCAB_COLLECT={MAX_VOCAB_COLLECT}; learn on a "
            "sample (uniform_sample_k / rate_sample) — BPE merge quality is "
            "statistical, not exhaustive"
        )
    vocab: dict[tuple[str, ...], int] = {_symbols(r.word): r.freq for r in rows}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, freq in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        vocab = {_merge_word(syms, best): freq for syms, freq in vocab.items()}
    return merges


def _merge_word(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encode of one word: repeatedly apply the lowest-rank
    applicable merge (the reference algorithm)."""
    syms = _symbols(word)
    while len(syms) > 1:
        candidates = [
            (ranks[p], p)
            for p in set(zip(syms, syms[1:]))
            if p in ranks
        ]
        if not candidates:
            break
        _, best = min(candidates)
        syms = _merge_word(syms, best)
    return list(syms)


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize every document with the learned merges. Output:
    (doc_id, n_words, n_tokens, tokens array<string>).

    Arrow-batched mapInPandas; per-batch memo over distinct words keeps the
    per-word merge loop off the hot path (Zipf: a batch re-encodes few
    distinct words). Tokens are lossless: concatenating a word's tokens and
    stripping the end marker reproduces the word (tested)."""
    ranks = {p: i for i, p in enumerate(merges)}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}

        def enc(word: str) -> list[str]:
            got = memo.get(word)
            if got is None:
                got = memo[word] = encode_word(word, ranks)
            return got

        for pdf in batches:
            toks = [
                [t for w in str(text).strip().split(" ") if w for t in enc(w)]
                for text in pdf[text_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_words": [len(str(t).strip().split(" ")) for t in pdf[text_col]],
                    "n_tokens": [len(t) for t in toks],
                    "tokens": toks,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        run, "doc_id long, n_words int, n_tokens int, tokens array<string>"
    )
