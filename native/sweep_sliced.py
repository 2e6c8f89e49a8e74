"""Candidate-bit-sliced NFA vs the packed-pair champion, on the real chip.

Interleaved A/B (each config twice, mirrored order) per the CLAUDE.md
honest-timing rules.  Tile sweep for the sliced kernel at maxerr=2 (the
headline), plus one sliced-vs-packed pair at every other maxerr.
Usage: python native/sweep_sliced.py > /tmp/sliced.log 2>&1
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
    _TUNE,
    approx_counts_pallas_packed,
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

base = []
# sliced tile sweep at the headline maxerr=2
for ctw in (8, 16):
    for wt in (128, 256, 512, 1024):
        base.append(("sliced", 2, ctw, wt))
# packed champion at every maxerr (tuned table), sliced alongside
for maxerr in (0, 1, 2, 3):
    eqsel, ct, wt = _TUNE[maxerr]
    base.append(("packed", maxerr, ct, wt))
    if maxerr != 2:
        base.append(("sliced", maxerr, 8, 256))
configs = base + base[::-1]  # each config twice, mirrored order

acc = {}
for algo, maxerr, ct, wt in configs:
    if algo == "sliced":
        def run(i, maxerr=maxerr, ctw=ct, wt=wt):
            return approx_counts_pallas_sliced(
                peq, wts[i % NBUF], wv, K, ctw=ctw, wt=wt, maxerr=maxerr)
    else:
        eqsel = _TUNE[maxerr][0]
        def run(i, maxerr=maxerr, ct=ct, wt=wt, eqsel=eqsel):
            return approx_counts_pallas_packed(
                peq, wts[i % NBUF], wv, K, ct=ct, wt=wt, maxerr=maxerr,
                pack=2, algo="nfa", eqsel=eqsel)

    dt = time_chained(run, ITERS)
    key = (algo, maxerr, ct, wt)
    acc[key] = min(acc.get(key, 1e9), dt)
    log(f"{algo:6s} maxerr={maxerr} ct={ct:3d} wt={wt:3d}: "
        f"{dt * 1e3:6.2f} ms  {C * W / dt / 1e9:5.2f} Gpairs/s")

log("---- best-of-2, sorted ----")
for (algo, maxerr, ct, wt), dt in sorted(acc.items(), key=lambda kv: kv[1]):
    log(f"{C * W / dt / 1e9:5.2f} Gpairs/s  {algo} maxerr={maxerr} "
        f"ct={ct} wt={wt}")
