"""Measure the bit-sliced Eq select vs the nested-where select on chip.

One process (pool claim is paid once), bench.py's honest-timing scaffold.
Covers the packed NFA kernel (pre-sliced production) at every maxerr plus a small tile
re-sweep at maxerr=2 in case the cheaper step shifts the optimum.
Usage: python native/sweep_eqsel.py > /tmp/eqsel.log 2>&1
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

configs = []
for maxerr in (2, 0, 1, 3):  # production default first
    for eqsel in ("slice", "where"):
        configs.append(("nfa", eqsel, maxerr, 128, 256))
for ct in (64, 256):
    for wt in (256, 512):
        configs.append(("nfa", "slice", 2, ct, wt))
configs.append(("nfa", "slice", 2, 128, 512))
configs.append(("myers", "slice", 2, 128, 256))
configs.append(("myers", "where", 2, 128, 256))

results = []
for algo, eqsel, maxerr, ct, wt in configs:
    def run(i, algo=algo, eqsel=eqsel, maxerr=maxerr, ct=ct, wt=wt):
        return approx_counts_pallas_packed(
            peq, wts[i % NBUF], wv, K, ct=ct, wt=wt, maxerr=maxerr,
            pack=2, algo=algo, eqsel=eqsel,
        )

    dt = time_chained(run, ITERS)
    gp = C * W / dt / 1e9
    results.append((gp, algo, eqsel, maxerr, ct, wt))
    log(f"{algo:6s} eqsel={eqsel:5s} maxerr={maxerr} ct={ct:3d} wt={wt:4d}: "
        f"{dt * 1e3:6.2f} ms  {gp:5.2f} Gpairs/s")

log("---- sorted ----")
for gp, algo, eqsel, maxerr, ct, wt in sorted(results, reverse=True):
    log(f"{gp:5.2f} Gpairs/s  {algo} eqsel={eqsel} maxerr={maxerr} "
        f"ct={ct} wt={wt}")
