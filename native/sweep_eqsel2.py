"""Focused eqsel A/B at high maxerr with tile sizes that vary register
pressure; each config measured twice, interleaved, to cancel drift.
Usage: python native/sweep_eqsel2.py > /tmp/eqsel2.log 2>&1
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
    approx_counts_pallas_packed,
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
for maxerr in (2, 3):
    for ct in (32, 64, 128):
        for eqsel in ("slice", "where"):
            base.append((eqsel, maxerr, ct, 256))
configs = base + base[::-1]  # each config twice, mirrored order

acc = {}
for eqsel, maxerr, ct, wt in configs:
    def run(i, eqsel=eqsel, maxerr=maxerr, ct=ct, wt=wt):
        return approx_counts_pallas_packed(
            peq, wts[i % NBUF], wv, K, ct=ct, wt=wt, maxerr=maxerr,
            pack=2, algo="nfa", eqsel=eqsel,
        )

    dt = time_chained(run, ITERS)
    key = (eqsel, maxerr, ct, wt)
    acc[key] = min(acc.get(key, 1e9), dt)
    log(f"nfa eqsel={eqsel:5s} maxerr={maxerr} ct={ct:3d} wt={wt}: "
        f"{dt * 1e3:6.2f} ms  {C * W / dt / 1e9:5.2f} Gpairs/s")

log("---- best-of-2, sorted ----")
for (eqsel, maxerr, ct, wt), dt in sorted(acc.items(),
                                          key=lambda kv: kv[1]):
    log(f"{C * W / dt / 1e9:5.2f} Gpairs/s  eqsel={eqsel} maxerr={maxerr} "
        f"ct={ct} wt={wt}")
