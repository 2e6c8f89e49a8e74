"""Round-4 confirm session: the production pass after ALL round-4 cuts
(transposed layout, packed single-fetch output, is_stable=False sorts,
2-buffer argument set with device-resident tail constants).

Measures: sequential host-input pass, pipelined pair, device-resident
chained compute, and the exact stage -- best-of-rounds to dodge the host
throttle.  Usage: python native/pass_confirm4.py > /tmp/confirm4.log 2>&1
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import log, setup_cache, time_chained  # noqa: E402

setup_cache()

import jax  # noqa: E402

from approx_counter_tpu.params import Params  # noqa: E402
from approx_counter_tpu.pipeline import Engine  # noqa: E402

W, M, K = 40960, 101, 16
ITERS = 8
rng = np.random.default_rng(11)
prm = Params(input_file="<mem>", output="/tmp/x")
eng = Engine(prm, use_pallas=True)
bufs = [rng.integers(0, 4, (W, M)).astype(np.uint8)
        for _ in range(2 * ITERS + 2)]

t0 = time.perf_counter()
eng.start_pass(bufs[-1], W - 5).finish()
log(f"first pass (compile+claim): {time.perf_counter() - t0:.1f}s")

# sequential host-input passes (the CLI's per-pass cost, unpipelined)
rounds = []
for _ in range(4):
    t0 = time.perf_counter()
    for i in range(ITERS):
        eng.start_pass(bufs[i], W - 5).finish()
    rounds.append((time.perf_counter() - t0) / ITERS)
log(f"sequential pass: best {min(rounds) * 1e3:.1f} ms "
    f"(rounds {[f'{x * 1e3:.1f}' for x in rounds]})")

# pipelined start+end pairs (the CLI's two-pass flow)
rounds = []
for r in range(4):
    t0 = time.perf_counter()
    for i in range(0, 2 * ITERS, 2):
        p1 = eng.start_pass(bufs[i], W - 5)
        p2 = eng.start_pass(bufs[i + 1], W - 5, prefetch=True)
        p1.finish()
        p2.finish()
    rounds.append((time.perf_counter() - t0) / ITERS)
log(f"pipelined pair: best {min(rounds) * 1e3:.1f} ms/pair "
    f"(rounds {[f'{x * 1e3:.1f}' for x in rounds]})")

# device-resident chained compute (the pure device cost of the pass)
from approx_counter_tpu.core.codec import pack_windows_sparse  # noqa: E402

fn = eng._fused_fn(512, M, "sparse")
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


def run_dev(i):
    return fn(*packed[i % ITERS], *tail)


dt = time_chained(run_dev, ITERS)
log(f"device-resident chained: {dt * 1e3:.2f} ms")
log("done")
