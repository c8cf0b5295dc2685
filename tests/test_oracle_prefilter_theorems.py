"""Property tests for the two edit-distance lower bounds the
PassJoin-exact ORACLE uses as prefilters (r10 verdict #5: the
MATERIALIZED-CTE speedup). The oracle's exactness guarantee — any recall
gap in the operator's segment blocking surfaces as a value mismatch —
survives ONLY because these are theorems, not blocking heuristics:

1. ed(x, y) >= |len(x) - len(y)|, rendered as a lossless bucket
   equi-join: |la - lb| <= 4 implies floor(la/5) and floor(lb/5) differ
   by at most 1 (adding < 5 crosses at most one multiple of 5).
2. ed(x, y) >= L1(hist(x), hist(y)) / 2 where hist counts each alphabet
   character: a substitution moves two counts by one each, an
   insertion/deletion moves one.

If either bound were violated for any string pair, the oracle could
prune a pair the DP would have admitted — so both get adversarial
random pinning here (hypothesis over the oracle's exact post-
normalization alphabet, a-z + space), plus the bucket-arithmetic lemma
over the integer domain directly.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

ALPHABET = "abcdefghijklmnopqrstuvwxyz "


def _ed(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _l1_hist(a: str, b: str) -> int:
    return sum(abs(a.count(c) - b.count(c)) for c in ALPHABET)


texts = st.text(alphabet=ALPHABET, min_size=0, max_size=40)


@settings(max_examples=300, deadline=None)
@given(texts, texts)
def test_edit_distance_lower_bounds(a: str, b: str):
    d = _ed(a, b)
    assert d >= abs(len(a) - len(b))
    # L1/2 rounds up: an odd L1 needs ceil, but >= L1/2 (float) suffices
    # for the oracle's integer form (L1 <= 2k <=> ed may be <= k)
    assert 2 * d >= _l1_hist(a, b)


@settings(max_examples=300, deadline=None)
@given(st.integers(0, 10_000), st.integers(0, 10_000))
def test_length_band_bucket_lemma(la: int, lb: int):
    """|la - lb| <= 4 implies the floor(len/5) buckets differ by <= 1 —
    the arithmetic that makes the oracle's bucket equi-join LOSSLESS
    (the probe side emits bucket-1, bucket, bucket+1, so every length-
    band-qualifying pair meets on an equality)."""
    if abs(la - lb) <= 4:
        assert abs(la // 5 - lb // 5) <= 1
