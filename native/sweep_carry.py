"""Carry-streaming experiments for the sliced NFA (VERDICT r2 weak #1).

The sliced kernel carries ~3k state tiles through the text fori_loop; the
~20% gap to its op-count floor is attributed to spilling that carry to
VMEM each iteration.  Levers tried here, interleaved A/B (each config
twice, mirrored order; only ratios are trustworthy -- absolutes drift
~15-25% between processes):

  * ``unroll``: text rows per fori_loop iteration (8 = production).  More
    rows amortize per-iteration carry spill/reload at the price of pad
    steps (m=101 -> 104/112/120 for unroll 8/16/24) and program size.
  * tile shape (ctw, wt): carried bytes per tile = ~3k * 4 * ctw * wt.

Usage: python native/sweep_carry.py > /tmp/carry.log 2>&1
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import log, setup_cache, time_chained  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

setup_cache()

from approx_counter_tpu.kernels.bpm import (  # noqa: E402
    approx_counts_pallas_sliced,
    build_peq,
)

C, W, M, K = 512, 40960, 101, 16
ITERS = 10

rng = np.random.default_rng(12345)
codes = rng.integers(0, 1 << (2 * K), C, dtype=np.uint64)
hi = (codes >> np.uint64(32)).astype(np.uint32)
lo = (codes & np.uint64(0xFFFFFFFF)).astype(np.uint32)
peq = jax.device_put(build_peq(hi, lo, K))
NBUF = ITERS + 1
wts = [
    jax.device_put(jnp.asarray(rng.integers(0, 4, (W, M)).astype(np.uint8).T))
    for _ in range(NBUF)
]
wv = jax.device_put(jnp.ones(W, bool))

base = [
    # (unroll, ctw, wt); (8, 8, 256) is the production config
    (8, 8, 256),
    (16, 8, 256),
    (24, 8, 256),
    (8, 8, 128),
    (16, 8, 128),
    (8, 16, 128),
    (16, 16, 128),
    (8, 16, 256),
]
configs = base + base[::-1]

acc = {}
for unroll, ctw, wt in configs:
    def run(i, unroll=unroll, ctw=ctw, wt=wt):
        return approx_counts_pallas_sliced(
            peq, wts[i % NBUF], wv, K, ctw=ctw, wt=wt, maxerr=2,
            unroll=unroll)

    dt = time_chained(run, ITERS)
    key = (unroll, ctw, wt)
    acc[key] = min(acc.get(key, 1e9), dt)
    log(f"unroll={unroll:2d} ctw={ctw:2d} wt={wt:4d}: "
        f"{dt * 1e3:6.2f} ms  {C * W / dt / 1e9:5.2f} Gpairs/s")

log("---- best-of-2, sorted ----")
for (unroll, ctw, wt), dt in sorted(acc.items(), key=lambda kv: kv[1]):
    log(f"{C * W / dt / 1e9:5.2f} Gpairs/s  unroll={unroll} ctw={ctw} "
        f"wt={wt}")
