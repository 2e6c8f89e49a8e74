"""Total ordering of k-mer counts.

Reproduces ``CompareCount`` (/root/reference/approx_counter.cpp:275-305):
rank (kmer, count) pairs by

  1. count   -- descending
  2. DUST complexity score (float32) -- ascending (lower-complexity first)
  3. packed code -- descending ("decreasing lexicographic")

Expressed as a composite ascending lexicographic key for
``jax.lax.sort(num_keys=4)``:

  key1 = ~count  (uint32 bitwise not: ascending ~count == descending count)
  key2 = integer dimer sum (order- and equality-equivalent to the f32 score;
         see core/complexity.py for the proof sketch)
  key3 = ~code_hi, key4 = ~code_lo

k == 2 quirk: the reference's score is NaN, which makes both branches of the
comparator's tie-break False -- equal-count k-mers are in *unspecified*
order (std::sort over equivalent elements).  Our key2 is then the constant 0
and ties fall to the deterministic code tie-break -- always a refinement of
the reference's ordering (documented divergence, SURVEY.md §5).

Invalid/padding entries carry count == 0 and sort strictly after every valid
entry (valid counts are >= 1, so ~count < ~0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from approx_counter_tpu.core.complexity import dimer_sum


def compare_count_keys(hi, lo, count, k: int, valid=None):
    """Build the 4 ascending-lexicographic uint32 sort keys for CompareCount.

    ``count`` may be any integer dtype (values < 2**32); ``valid`` optionally
    masks entries, forcing them after all valid ones.
    """
    hi = jnp.asarray(hi, jnp.uint32)
    lo = jnp.asarray(lo, jnp.uint32)
    cnt = jnp.asarray(count, jnp.uint32)
    if valid is not None:
        cnt = jnp.where(valid, cnt, jnp.uint32(0))
    k1 = ~cnt
    k2 = dimer_sum(hi, lo, k).astype(jnp.uint32)
    k3 = ~hi
    k4 = ~lo
    return k1, k2, k3, k4


def sort_by_compare_count(hi, lo, count, k: int, valid=None, extras=()):
    """Sort entries into CompareCount order; returns (hi, lo, count, *extras).

    Invalid entries (``valid`` False or count==0) land at the end.
    """
    k1, k2, k3, k4 = compare_count_keys(hi, lo, count, k, valid)
    operands = [k1, k2, k3, k4, jnp.asarray(count)] + [jnp.asarray(e) for e in extras]
    out = jax.lax.sort(operands, num_keys=4)
    s_k3, s_k4, s_count = out[2], out[3], out[4]
    return (~s_k3).astype(jnp.uint32), (~s_k4).astype(jnp.uint32), s_count, *out[5:]


def compare_count_np(codes: np.ndarray, counts: np.ndarray, k: int):
    """Host-side argsort into CompareCount order (NumPy twin).

    Returns indices ordering (count desc, dimer-sum asc, code desc).
    """
    from approx_counter_tpu.core.complexity import dimer_sum_np

    codes = np.asarray(codes, dtype=np.uint64)
    counts = np.asarray(counts, dtype=np.uint64)
    s = dimer_sum_np(codes, k)
    # np.lexsort: last key is primary.
    return np.lexsort((np.iinfo(np.uint64).max - codes, s, -counts.astype(np.int64)))
