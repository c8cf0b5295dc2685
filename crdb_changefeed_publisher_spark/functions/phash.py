"""Engine-portable polynomial string hash, Arrow-vectorized.

The hash is the classic left fold ``h = (h*31 + code(ch)) mod 1e9+7`` over a
string's characters (codepoints), identical to what a SQL oracle expresses
with ``list_reduce`` — see plans/llm.py oracles. Round 1 computed it with
built-in HOF lambdas (``zip_with`` + ``aggregate``); those are JVM-side but
*interpreted*, re-evaluated per element, and measured 4-10x slower than this
Arrow-batched numpy closed form (docs/SCALE.md "HOF lambda trap"). The fold
equals ``sum(code_i * 31^(n-1-i)) mod p`` — exact integer arithmetic, so both
forms and the oracle agree bit-for-bit.

Scale shape: a scalar pandas_udf — one Python worker pass per Arrow batch,
no shuffle, embarrassingly parallel over partitions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

MOD = 1_000_000_007
BASE = 31
_MAX_POW = 4096
# 31^k mod p, exact (Python ints -> int64; all values < 2^30)
POWERS = np.array([pow(BASE, k, MOD) for k in range(_MAX_POW)], dtype=np.int64)


def _hash_batch(texts: pd.Series, max_len: int) -> pd.Series:
    """Vectorized fold over one Arrow batch.

    ASCII fast path: concatenate all (truncated) strings into one byte
    buffer, compute per-char ``code * 31^(n-1-i) mod p`` in one shot, and
    segment-sum with ``np.add.reduceat``. Non-ASCII rows fall back to a
    per-row codepoint loop (same arithmetic on ``ord``, matching Spark's
    ``ascii()`` / DuckDB's ``ascii()`` codepoint semantics).
    """
    vals = texts.to_numpy(dtype=object)
    out = np.zeros(len(vals), dtype=np.int64)
    ascii_idx, ascii_strs, other_idx = [], [], []
    for i, s in enumerate(vals):
        if s is None:
            out[i] = -1  # sentinel; mapped to null below
        else:
            t = s[:max_len]
            if t.isascii():
                ascii_idx.append(i)
                ascii_strs.append(t)
            else:
                other_idx.append(i)
    if ascii_strs:
        lens = np.fromiter((len(t) for t in ascii_strs), dtype=np.int64, count=len(ascii_strs))
        codes = np.frombuffer("".join(ascii_strs).encode("ascii"), dtype=np.uint8).astype(
            np.int64
        )
        ends = np.cumsum(lens)
        starts = ends - lens
        # exponent of char at absolute position i in segment j: (end_j - 1) - i
        exp = np.repeat(ends - 1, lens) - np.arange(len(codes), dtype=np.int64)
        contrib = (codes * POWERS[exp]) % MOD  # < 2^30 per term
        nonempty = lens > 0
        seg = np.zeros(len(ascii_strs), dtype=np.int64)
        if codes.size:
            sums = np.add.reduceat(contrib, starts[nonempty])  # < 2^30 * 4096 < 2^42
            seg[nonempty] = sums % MOD
        out[np.array(ascii_idx, dtype=np.int64)] = seg
    for i in other_idx:
        t = vals[i][:max_len]
        codes = np.fromiter(map(ord, t), dtype=np.int64, count=len(t))
        out[i] = int((codes * POWERS[len(t) - 1 :: -1] % MOD).sum() % MOD) if len(t) else 0
    res = pd.Series(out, dtype="Int64")
    res[res == -1] = pd.NA
    return res


# DataType objects (not DDL strings): a string returnType is parsed via the
# active SparkContext at decoration time, which breaks importing this module
# before a session exists (bench.py imports plans first).
@pandas_udf(LongType())
def _poly_hash_256(texts: pd.Series) -> pd.Series:
    return _hash_batch(texts, 256)


@pandas_udf(LongType())
def _poly_hash_4096(texts: pd.Series) -> pd.Series:
    return _hash_batch(texts, 4096)


def poly_hash(col: Column | str, max_len: int = 256) -> Column:
    """Portable polynomial hash of the first `max_len` chars (256 or 4096)."""
    c = F.col(col) if isinstance(col, str) else col
    if max_len == 256:
        return _poly_hash_256(c)
    if max_len == 4096:
        return _poly_hash_4096(c)
    raise ValueError("max_len must be 256 (shingles) or 4096 (documents)")
