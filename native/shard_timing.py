"""One measured point for the scaling model (BASELINE.md): the production
kernel inside shard_map + psum on a 1-device mesh on the real chip,
vs the direct kernel call -- isolates the shard_map/psum wrapper cost that
multi-chip scaling would add per pass.

Usage: python native/shard_timing.py > /tmp/shard.log 2>&1
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import log, setup_cache, time_chained  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

setup_cache()

from approx_counter_tpu.dist.mesh import (  # noqa: E402
    approx_counts_sharded,
    data_mesh,
)
from approx_counter_tpu.kernels.bpm import approx_counts, build_peq  # noqa: E402

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

mesh = data_mesh(jax.devices()[:1])


def run_direct(i):
    return approx_counts(peq, wts[i % NBUF], wv, K, use_pallas=True)


def run_sharded(i):
    return approx_counts_sharded(
        peq, wts[i % NBUF], wv, K, mesh=mesh, use_pallas=True)


for name, run in (("direct", run_direct), ("shard_map+psum", run_sharded),
                  ("direct2", run_direct), ("shard_map2", run_sharded)):
    dt = time_chained(run, ITERS)
    log(f"{name:15s}: {dt * 1e3:6.2f} ms  {C * W / dt / 1e9:5.2f} Gpairs/s")
log(f"psum payload per pass: {C * 4} bytes (C={C} int32 counts)")
