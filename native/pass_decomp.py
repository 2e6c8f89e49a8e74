"""Decompose the steady-state full-pass latency (one chip claim):

  (a) fused sparse pass, host inputs   -- production: pack + H2D + compute
                                          + fetch (bench.py's 'full pass')
  (b) fused sparse pass, device-resident inputs (distinct buffers), one
      small fetch -- isolates device compute + dispatch/fetch round trip
  (c) exact stage alone, device-resident
  (d) production kernel alone, device-resident

(a) - (b) = host pack + H2D through the remote tunnel.
(b) - compute estimate = dispatch/fetch round-trip overhead.

Usage: python native/pass_decomp.py > /tmp/decomp.log 2>&1
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import log, setup_cache, time_chained  # noqa: E402

setup_cache()

import jax  # noqa: E402

from approx_counter_tpu.core.codec import pack_windows_sparse  # noqa: E402
from approx_counter_tpu.count.exact import exact_count_select  # noqa: E402
from approx_counter_tpu.kernels.bpm import (  # noqa: E402
    approx_counts,
    build_peq,
)
from approx_counter_tpu.params import Params  # noqa: E402
from approx_counter_tpu.pipeline import Engine  # noqa: E402

W, M, K, CAP = 40960, 101, 16, 512
ITERS = 8

rng = np.random.default_rng(11)
prm = Params(input_file="<mem>", output="/tmp/x")
eng = Engine(prm, use_pallas=True)
bufs = [rng.integers(0, 4, (W, M)).astype(np.uint8)
        for _ in range(ITERS + 1)]

t0 = time.perf_counter()
eng.start_pass(bufs[-1], W - 5).finish()
log(f"first pass (compile+claim): {time.perf_counter() - t0:.1f}s")

# (a) production: host inputs
best = None
for _ in range(3):
    t0 = time.perf_counter()
    for i in range(ITERS):
        eng.start_pass(bufs[i], W - 5).finish()
    dt = (time.perf_counter() - t0) / ITERS
    best = dt if best is None else min(best, dt)
log(f"(a) full pass, host inputs:          {best * 1e3:.1f} ms")

# (b) device-resident: pre-pack + pre-put all buffers, same executable
# (packed_out=False so the per-key fetch fence below still works)
fn = eng._fused_fn(512, M, "sparse", packed_out=False)
packed = []
for i in range(ITERS):
    lo, n_idx, ncols, m = pack_windows_sparse(bufs[i], W - 5)
    n_idx_ext = np.empty(len(n_idx) + 2, np.int32)
    n_idx_ext[:-2] = n_idx
    n_idx_ext[-2] = W - 5
    n_idx_ext[-1] = ncols
    packed.append((jax.device_put(lo), jax.device_put(n_idx_ext)))
jax.block_until_ready([p[0] for p in packed])
tail = eng._tail_dev()
best = None
for _ in range(3):
    t0 = time.perf_counter()
    for lo, n_idx_ext in packed:
        out = fn(lo, n_idx_ext, *tail)
        int(jax.device_get(out["exact"]["n_keep"]))  # small fetch fence
    dt = (time.perf_counter() - t0) / ITERS
    best = dt if best is None else min(best, dt)
log(f"(b) full pass, device-resident:      {best * 1e3:.1f} ms")

# (b2) pure device time per pass: chain ITERS dispatches, ONE fetch at
# the end (outputs combined so work can't be elided) -- subtracting from
# (b) isolates the per-call dispatch+fetch round trip through the tunnel
best = None
for _ in range(3):
    t0 = time.perf_counter()
    acc = None
    for lo, n_idx_ext in packed:
        out = fn(lo, n_idx_ext, *tail)
        c = out["approx_count"]
        acc = c if acc is None else acc + c
    np.asarray(acc)
    dt = (time.perf_counter() - t0) / ITERS
    best = dt if best is None else min(best, dt)
log(f"(b2) device-resident, chained 1-fetch: {best * 1e3:.1f} ms")

# (c) exact stage alone, device-resident windows
wins_dev = [jax.device_put(b) for b in bufs[:ITERS]]
jax.block_until_ready(wins_dev)


def run_exact(i):
    out = exact_count_select(
        wins_dev[i % ITERS], nv, K, eng.lc_sum_thr, eng.fhi, eng.flo,
        np.int32(prm.limit), np.int32(0), cap=512, n_forbidden=0,
        use_solid=False,
    )
    return out["sel_count"]


dt = time_chained(run_exact, ITERS)
log(f"(c) exact stage, device-resident:    {dt * 1e3:.1f} ms")

# (d) kernel alone
codes = rng.integers(0, 1 << (2 * K), CAP, dtype=np.uint64)
hi = (codes >> np.uint64(32)).astype(np.uint32)
lo32 = (codes & np.uint64(0xFFFFFFFF)).astype(np.uint32)
peq = jax.device_put(build_peq(hi, lo32, K))
wts = [jax.device_put(np.ascontiguousarray(b.T)) for b in bufs[:ITERS]]
wv = jax.device_put(np.ones(W, bool))
jax.block_until_ready(wts)


def run_kernel(i):
    return approx_counts(peq, wts[i % ITERS], wv, K, use_pallas=True)


dt = time_chained(run_kernel, ITERS)
log(f"(d) kernel, device-resident:         {dt * 1e3:.1f} ms")
