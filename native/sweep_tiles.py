"""One-off: sweep Pallas BPM tile sizes on the real chip.

Batched per CLAUDE.md hazards: distinct input buffers per call, outputs
chained by addition, one fetch per timing, persistent compile cache.
Usage: python native/sweep_tiles.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

cache = os.path.expanduser("~/.cache/approx_counter_tpu/jax")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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
for ct in (128, 256, 512):
    for wt in (256, 512, 1024, 2048):
        if C % ct == 0 and W % wt == 0:
            configs.append(("packed", ct, wt))
configs.append(("unpacked", 256, 512))  # current non-packed reference point

results = []
for name, ct, wt in configs:
    fn = (approx_counts_pallas_packed if name == "packed"
          else approx_counts_pallas)

    def run(i, fn=fn, ct=ct, wt=wt):
        return fn(peq, wts[i % NBUF], wv, K, ct=ct, wt=wt)

    try:
        t0 = time.perf_counter()
        np.asarray(run(ITERS))
        compile_s = time.perf_counter() - t0
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            acc = None
            for i in range(ITERS):
                o = run(i)
                acc = o if acc is None else acc + o
            np.asarray(acc)
            dt = (time.perf_counter() - t0) / ITERS
            best = dt if best is None else min(best, dt)
        gpairs = C * W / best / 1e9
        print(f"{name} ct={ct} wt={wt}: {best*1e3:.2f} ms "
              f"{gpairs:.2f} Gpairs/s (compile {compile_s:.0f}s)", flush=True)
        results.append((gpairs, name, ct, wt))
    except Exception as e:  # noqa: BLE001
        print(f"{name} ct={ct} wt={wt}: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)

results.sort(reverse=True)
print("BEST:", results[:3])
