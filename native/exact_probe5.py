"""Round-5 exact-stage attack, measured on chip in ONE process (one claim).

The round-4 split: 13.4 ms full-pass device compute = ~10.3 exact +
~4.6 kernel (overlap).  Exact = pack + 3.5M 1-key grouping sort (5.55) +
RLE/filters + _topk_rank selection pair (~6 with overlap).  This probe
measures the two structural reductions the round-4 verdict ordered:

  (a) radix/bucket partition of the grouping sort: batched [R, P/R]
      row sorts give the UPPER BOUND of any bucket scheme (they skip the
      partition entirely); the digit-key payload sort measures the
      cheapest scatter-free partition (a 1-key sort by 4-bit MSB digit
      carrying the code as payload).  If partition cost alone exceeds
      the flat-sort-minus-rowsort gap, every bucket scheme is a negative.
  (b) fused selection: _topk_rank_rowsort (ONE batched composite 2-key
      row sort + tiny level-2 sort) vs the r3/r4 _topk_rank (two
      hierarchical top_k passes + 2cap merge sort).

Plus the end-to-end exact stage A/B (select_impl sweep) at production
shapes, and HBM bytes-moved context for the floor argument.

Usage: python native/exact_probe5.py > /tmp/exact5.log 2>&1
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import log, setup_cache, time_chained  # noqa: E402

setup_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

W, M, K, CAP = 40960, 101, 16, 512
P = W * (M - K + 1)  # 3522560
ITERS = 8
rng = np.random.default_rng(5)

log(f"backend={jax.default_backend()} P={P}")

keys = [jax.device_put(rng.integers(0, 1 << 32, P, dtype=np.uint64)
                       .astype(np.uint32)) for _ in range(ITERS + 1)]
codes = [jax.device_put(rng.integers(0, 1 << 32, P, dtype=np.uint64)
                        .astype(np.uint32)) for _ in range(ITERS + 1)]
jax.block_until_ready(keys)

# ---------------------------------------------------------------- (b) selection


@jax.jit
def sel_topk(k1, lo):
    from approx_counter_tpu.count.exact import _topk_rank

    o1, o4 = _topk_rank(k1, lo, CAP)
    return o1 + o4


def make_rowsort(R):
    @jax.jit
    def sel_rowsort(k1, lo):
        C = P // R
        r1, r4 = jax.lax.sort(
            [k1.reshape(R, C), (~lo).reshape(R, C)], dimension=1,
            num_keys=2, is_stable=False,
        )
        f1, f4 = jax.lax.sort(
            [r1[:, :CAP].reshape(-1), r4[:, :CAP].reshape(-1)],
            num_keys=2, is_stable=False,
        )
        return f1[:CAP] + f4[:CAP]

    return sel_rowsort


log("--- (b) selection: fused composite row sort vs hier top_k pair ---")
for name, fn in [("topk pair (r4 production)", sel_topk)] + [
    (f"rowsort R={R}", make_rowsort(R)) for R in (128, 256, 512, 1024, 2048)
    if P % R == 0 and P // R >= CAP
]:
    dt = time_chained(
        lambda i, f=fn: f(keys[i % ITERS], codes[i % ITERS]), ITERS
    )
    log(f"{name:28s}: {dt * 1e3:.2f} ms")

# ------------------------------------------------------------ (a) grouping sort


@jax.jit
def sort_flat(lo):
    (s,) = jax.lax.sort([lo], num_keys=1, is_stable=False)
    return s[:CAP]


def make_rowsort1(R):
    @jax.jit
    def f(lo):
        s = jax.lax.sort([lo.reshape(R, P // R)], dimension=1,
                         num_keys=1, is_stable=False)[0]
        return s[:, :1].reshape(-1)[:CAP]

    return f


@jax.jit
def partition_digit(lo):
    # cheapest scatter-free 16-way MSB partition: 1-key sort by the 4-bit
    # digit, code rides as payload
    digit = lo >> jnp.uint32(28)
    _, s = jax.lax.sort([digit, lo], num_keys=1, is_stable=False)
    return s[:CAP]


@jax.jit
def sort_2key_full(k1, lo):
    o1, o4 = jax.lax.sort([k1, ~lo], num_keys=2, is_stable=False)
    return o1[:CAP] + o4[:CAP]


log("--- (a) grouping sort: flat vs batched rows vs partition cost ---")
dt = time_chained(lambda i: sort_flat(codes[i % ITERS]), ITERS)
log(f"{'flat 1-key (production)':28s}: {dt * 1e3:.2f} ms")
for R in (16, 64, 256, 1024):
    if P % R:
        continue
    dt = time_chained(
        lambda i, f=make_rowsort1(R): f(codes[i % ITERS]), ITERS
    )
    log(f"{f'row 1-key sort R={R}':28s}: {dt * 1e3:.2f} ms  (bucket upper bound)")
dt = time_chained(lambda i: partition_digit(codes[i % ITERS]), ITERS)
log(f"{'digit partition (payload)':28s}: {dt * 1e3:.2f} ms  (partition cost alone)")
dt = time_chained(
    lambda i: sort_2key_full(keys[i % ITERS], codes[i % ITERS]), ITERS
)
log(f"{'full 2-key ranking sort':28s}: {dt * 1e3:.2f} ms  (pre-r3 baseline)")

# --------------------------------------------------- end-to-end exact stage A/B

from approx_counter_tpu.core.complexity import lc_sum_threshold  # noqa: E402
from approx_counter_tpu.count.exact import exact_count_select_rows  # noqa: E402

wins = [
    jax.device_put(rng.integers(0, 4, (M, W)).astype(np.uint8))
    for _ in range(ITERS + 1)
]
row_mask = jax.device_put(np.ones(W, bool))
fhi = jnp.zeros(0, jnp.uint32)
thr = jnp.int32(lc_sum_threshold(1.0, K))
jax.block_until_ready(wins)


def make_stage(impl):
    def f(i):
        out = exact_count_select_rows(
            wins[i % ITERS], row_mask, K, thr, fhi, fhi,
            jnp.int32(500), jnp.int32(0), cap=CAP, n_forbidden=0,
            use_solid=False, transposed=True, select_impl=impl,
        )
        return out["sel_lo"] + out["sel_count"]

    return f


log("--- end-to-end exact stage (transposed, production shapes) ---")
for impl in ("topk", "rowsort"):
    dt = time_chained(make_stage(impl), ITERS)
    log(f"{f'exact stage select={impl}':28s}: {dt * 1e3:.2f} ms")

# --------------------------------------------------------------- floor context
bytes_sort = P * 4 * 2  # one read + one write of the 14 MB key vector
log(f"context: P={P} uint32 = {P*4/1e6:.1f} MB; one read+write = "
    f"{bytes_sort/1e6:.1f} MB = {bytes_sort/819e9*1e3:.3f} ms at 819 GB/s HBM")
log("done")
