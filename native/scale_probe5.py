"""Round-5 stretch: large-sn scale points (VERDICT #8).

The scaling model extrapolates from sn=40960; this measures the full
fused pass (device-resident, chained) at sn in {40960, 102400, 409600}
windows to confirm the sliced kernel and the exact stage hold their
per-pair / per-position rates when windows no longer fit a few tiles
(W >> 40960, wt tiling, P up to 35.2M sort elements).

Usage: python native/scale_probe5.py > /tmp/scale5.log 2>&1
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import log, setup_cache  # noqa: E402

setup_cache()

import jax  # noqa: E402

from approx_counter_tpu.core.codec import pack_windows_sparse  # noqa: E402
from approx_counter_tpu.params import Params  # noqa: E402
from approx_counter_tpu.pipeline import CT, Engine, _round_up  # noqa: E402

M, K, LIMIT = 101, 16, 500
rng = np.random.default_rng(17)

prm = Params(input_file="<mem>", output="/tmp/x", sn=0, sl=M - 1, k=K,
             limit=LIMIT)
eng = Engine(prm, use_pallas=True)
cap = max(512, _round_up(min(LIMIT, 1 << 20), CT))
tail = eng._tail_dev()

first = True
for W in (40960, 102400, 409600):
    iters = 6 if W <= 102400 else 3
    devs = []
    for _ in range(iters):
        b = rng.integers(0, 4, (W, M)).astype(np.uint8)
        lo, n_idx, ncols, m = pack_windows_sparse(b, W - 5)
        ext = np.empty(len(n_idx) + 2, np.int32)
        ext[:-2] = n_idx
        ext[-2] = W - 5
        ext[-1] = ncols
        devs.append((jax.device_put(lo), jax.device_put(ext)))
    jax.block_until_ready([d for pair in devs for d in pair])
    fn = eng._fused_fn(cap, M, "sparse")
    t0 = time.perf_counter()
    np.asarray(fn(*devs[0], *tail))
    tag = "compile+claim" if first else "compile"
    log(f"W={W}: first call ({tag}): {time.perf_counter() - t0:.1f}s")
    first = False
    best = None
    for _ in range(4):
        t0 = time.perf_counter()
        acc = None
        for i in range(iters):
            o = fn(*devs[i], *tail)
            acc = o if acc is None else acc + o
        np.asarray(acc)
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    P = W * (M - K + 1)
    pairs = cap * W
    log(f"W={W:7d}: full pass {best * 1e3:7.2f} ms | "
        f"{W / best / 1e6:6.2f} M windows/s | "
        f"{pairs / best / 1e9:6.2f} G pairs/s (incl. exact) | "
        f"P={P / 1e6:.2f}M positions, {P / best / 1e6:7.1f} M pos/s")
log("done")
