"""Tile-size sweep for the Pallas BPM kernels on the real chip.

Reuses bench.py's measurement scaffold (persistent compile cache, distinct
input buffers per call, chained-by-addition outputs, single fetch fence --
the CLAUDE.md honest-timing rules).  The shipped defaults (ct=32, wt=512
for the packed kernel) come from this sweep.
Usage: python native/sweep_tiles.py
"""
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import log, setup_cache, time_chained  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

setup_cache()

from approx_counter_tpu.kernels.bpm import (  # noqa: E402
    approx_counts_pallas,
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
for ct in (16, 32, 64, 128):
    for wt in (256, 512, 1024, 2048):
        if C % ct == 0 and W % wt == 0:
            configs.append(("nfa", ct, wt))  # shipped default for maxerr<=2
for ct in (16, 32, 64, 128, 256):
    for wt in (256, 512, 1024):
        if C % ct == 0 and W % wt == 0:
            configs.append(("packed", ct, wt))
configs.append(("unpacked", 32, 512))   # shipped unpacked default
configs.append(("unpacked", 128, 256))  # measured unpacked optimum (k=18)

if len(sys.argv) > 1:  # e.g. "nfa" to sweep only one kernel family
    configs = [c for c in configs if c[0] in sys.argv[1:]]

results = []
for name, ct, wt in configs:
    if name == "unpacked":
        fn = approx_counts_pallas
    elif name == "nfa":
        fn = functools.partial(approx_counts_pallas_packed, algo="nfa")
    else:
        fn = approx_counts_pallas_packed

    def run(i, fn=fn, ct=ct, wt=wt):
        return fn(peq, wts[i % NBUF], wv, K, ct=ct, wt=wt)

    try:
        best = time_chained(run, ITERS)
        gpairs = C * W / best / 1e9
        log(f"{name} ct={ct} wt={wt}: {best*1e3:.2f} ms "
            f"{gpairs:.2f} Gpairs/s")
        results.append((gpairs, name, ct, wt))
    except Exception as e:  # noqa: BLE001
        log(f"{name} ct={ct} wt={wt}: FAILED {type(e).__name__}: "
            f"{str(e)[:200]}")

results.sort(reverse=True)
log(f"BEST: {results[:3]}")
