"""Sub-stage timing proxies for the exact stage (one chip claim):
the 3.5M-element sort, the two lax.top_k reductions, the dimer sum, and
the full exact_count_select -- apportions the ~20 ms device-resident
exact stage so optimization effort lands where the time is.

Usage: python native/exact_decomp.py > /tmp/exact_decomp.log 2>&1
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import log, setup_cache, time_chained  # noqa: E402

setup_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from approx_counter_tpu.core.complexity import dimer_sum  # noqa: E402
from approx_counter_tpu.count.exact import exact_count_select  # noqa: E402

W, M, K, CAP = 40960, 101, 16, 512
P = W * (M - K + 1)
ITERS = 8
rng = np.random.default_rng(5)

keys = [jax.device_put(rng.integers(0, 1 << 32, P, dtype=np.uint64)
                       .astype(np.uint32)) for _ in range(ITERS)]
wins = [jax.device_put(rng.integers(0, 4, (W, M)).astype(np.uint8))
        for _ in range(ITERS)]
jax.block_until_ready(keys)
jax.block_until_ready(wins)
log(f"P = {P}")


@jax.jit
def just_sort(x):
    (s,) = jax.lax.sort([x], num_keys=1)
    return s[:CAP]


@jax.jit
def just_topk2(x):
    _, i1 = jax.lax.top_k(x.astype(jnp.int32), CAP)
    _, i2 = jax.lax.top_k((~x).astype(jnp.int32), CAP)
    return i1 + i2


@jax.jit
def just_dimer(x):
    return dimer_sum(jnp.zeros_like(x), x, K)[:CAP]


@jax.jit
def pack_sweep(w):
    """The k-position packing + validity sweep (stage 1 of exact)."""
    n, m = w.shape
    p = m - K + 1
    lo = jnp.zeros((n, p), jnp.uint32)
    bad = jnp.zeros((n, p), jnp.bool_)
    for j in range(K):
        sym = jax.lax.slice_in_dim(w, j, j + p, axis=1)
        bad = bad | (sym >= 4)
        lo = (lo << np.uint32(2)) | sym.astype(jnp.uint32)
    return jnp.where(bad, 0, lo).reshape(-1)[:CAP]


def full(i):
    out = exact_count_select(
        wins[i % ITERS], np.int32(W - 5), K, np.int32(200),
        np.zeros(0, np.uint32), np.zeros(0, np.uint32),
        np.int32(500), np.int32(0), cap=CAP, n_forbidden=0,
        use_solid=False,
    )
    return out["sel_count"]


for name, fn, bufs in (
    ("sort 3.5M u32", just_sort, keys),
    ("2x top_k(512)", just_topk2, keys),
    ("dimer_sum 3.5M", just_dimer, keys),
    ("pack sweep", pack_sweep, wins),
    ("full exact_count_select", full, None),
):
    if bufs is None:
        dt = time_chained(fn, ITERS)
    else:
        dt = time_chained(lambda i, f=fn, b=bufs: f(b[i % ITERS]), ITERS)
    log(f"{name:24s}: {dt * 1e3:.2f} ms")
