"""DUST-style dimer complexity score.

Reproduces ``getComplexity`` / ``haveLowComplexity``
(/root/reference/approx_counter.cpp:214-267), derived from the 2006 DUST
masking paper (doi 10.1089/cmb.2006.13.1028): slide a 2-base window over the
packed k-mer, histogram the 16 dimer codes, and score

    s = sum_v v*(v-1) / float32(2*(k-2))

Parity strategy: the reference computes the score as a C++ ``float`` and
uses it in (a) the low-complexity filter (score >= threshold => reject) and
(b) the CompareCount tie-break.  The integer dimer sum is *order- and
equality-equivalent* to the f32 score for every k in [2, 32]: quotients are
ratios of small integers (s <= (k-1)(k-2) <= 930, divisor 2(k-2) <= 60)
whose spacing (>= 1/60) is ~10^4 x the f32 ulp at their magnitude (<= 15.5),
so distinct sums never round to equal f32 scores.  Device code therefore
uses the integer sum directly (``dimer_sum``); when the float value itself
is needed, it comes from a host-precomputed exact-IEEE table
(``complexity_score``) rather than a device division -- XLA CPU lowers f32
divide to a 1-ulp-off reciprocal multiply, which would break bit-parity.

k == 2 quirk: the reference divides by zero; 0/0.0f is NaN, so
``haveLowComplexity`` (NaN >= t) is always False and the comparator's
complexity tie-break never fires.  Reproduced: the filter threshold becomes
unreachable and the integer sum is constant 0.

``adjust_threshold`` (approx_counter.cpp:183-186) rescales a k=16-calibrated
threshold to the actual k by ((k-1)/(k_old-1))^2 (the code computes
pow(k-2+1, 2)).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def adjust_threshold(c_old: float, k_old: int, k_new: int) -> float:
    """approx_counter.cpp:183-186 -- float32 arithmetic like the C++."""
    c_old = np.float32(c_old)
    ratio = np.float32(
        np.power(np.float64(k_new - 2 + 1), 2) / np.power(np.float64(k_old - 2 + 1), 2)
    )
    return float(np.float32(c_old * ratio))


def max_dimer_sum(k: int) -> int:
    """Largest possible sum_v v*(v-1): all k-1 dimers identical."""
    return (k - 1) * (k - 2)


@functools.lru_cache(maxsize=None)
def score_table(k: int) -> np.ndarray:
    """Exact-IEEE f32 score for every possible integer dimer sum.

    ``score_table(k)[s] == float32(s) / float32(2*(k-2))`` computed on host
    with correctly-rounded IEEE division.  For k == 2 every entry is NaN.
    """
    s = np.arange(max_dimer_sum(k) + 1, dtype=np.float32)
    with np.errstate(invalid="ignore", divide="ignore"):
        return (s / np.float32(2 * (k - 2))).astype(np.float32)


def lc_sum_threshold(threshold: float, k: int) -> int:
    """Smallest integer dimer sum s with f32(s / (2(k-2))) >= threshold.

    Device filtering then reduces to the integer compare ``s >= s_thr``,
    bit-equivalent to the reference's float compare.  Returns s_max+1 when
    nothing can be rejected (k == 2 NaN quirk, or threshold above range).
    """
    tbl = score_table(k)
    hits = np.nonzero(tbl >= np.float32(threshold))[0]
    return int(hits[0]) if len(hits) else max_dimer_sum(k) + 1


def dimer_sum(hi, lo, k: int):
    """Integer sum_v v*(v-1) over the 16-dimer histogram (device, vectorized).

    ``hi``/``lo`` are uint32 code halves.  Dimer j (from the low end,
    matching the reference's ``kmer & 15; kmer >>= 2`` loop) spans bit
    positions [2j, 2j+4).
    """
    hi = jnp.asarray(hi, jnp.uint32)
    lo = jnp.asarray(lo, jnp.uint32)
    dimers = []
    for j in range(k - 1):
        b = 2 * j
        if b + 4 <= 32:
            d = (lo >> np.uint32(b)) & np.uint32(15)
        elif b >= 32:
            d = (hi >> np.uint32(b - 32)) & np.uint32(15)
        else:  # straddles the 32-bit boundary (b == 30)
            d = ((lo >> np.uint32(30)) | (hi << np.uint32(2))) & np.uint32(15)
        dimers.append(d.astype(jnp.int32))
    # sum_v v*(v-1) == number of ordered equal pairs == 2 * #unordered:
    # C(k-1,2) pairwise compares over the k-1 dimer arrays kept as SEPARATE
    # values -- a pure elementwise DAG XLA fuses into one pass.  (A stacked
    # (..., k-1) array + column slices materializes ~(k-1) x input bytes in
    # HBM and made this the hottest op of the exact stage: 22 -> ~2 ms at
    # the 3.5M-position default batch.)
    n = k - 1
    acc = jnp.zeros(jnp.shape(lo), jnp.int32)
    for i in range(n):
        for j in range(i + 1, n):
            acc = acc + (dimers[i] == dimers[j]).astype(jnp.int32)
    return acc * 2


def complexity_score(hi, lo, k: int):
    """float32 DUST score per packed k-mer, bit-exact vs the C++ float
    (table lookup of host-computed IEEE divisions)."""
    s = dimer_sum(hi, lo, k)
    return jnp.take(jnp.asarray(score_table(k)), s, axis=0)


def dimer_sum_np(codes: np.ndarray, k: int) -> np.ndarray:
    """NumPy host-side twin of :func:`dimer_sum` over uint64 codes."""
    codes = np.asarray(codes, dtype=np.uint64)
    counts = np.zeros(codes.shape + (16,), dtype=np.int64)
    v = codes.copy()
    for _ in range(k - 1):
        d = (v & np.uint64(15)).astype(np.int64)
        np.put_along_axis(
            counts, d[..., None], np.take_along_axis(counts, d[..., None], -1) + 1, -1
        )
        v >>= np.uint64(2)
    return np.sum(counts * (counts - 1), axis=-1)


def complexity_score_np(codes: np.ndarray, k: int) -> np.ndarray:
    """NumPy host-side twin of :func:`complexity_score`."""
    return score_table(k)[dimer_sum_np(codes, k)]


def have_low_complexity(hi, lo, k: int, threshold: float):
    """Boolean low-complexity test: score >= threshold ==> reject.

    Matches ``haveLowComplexity`` (approx_counter.cpp:214-234) including the
    k == 2 never-rejects NaN quirk.
    """
    return dimer_sum(hi, lo, k) >= lc_sum_threshold(threshold, k)
