"""Round-4 session C: do async H2D transfers pipeline on this tunnel?

Session B/confirm data fit H2D(size) ~= 27 ms fixed + ~18 ms/MB, and the
production pass is transfer-bound (device compute 13.4 ms vs ~45 ms H2D
for the 1.03 MB sparse plane).  If the 27 ms is per-SYNC (not per
transfer), async puts queued back-to-back should amortize it and the
pipelined pass drops toward max(compute, marginal bandwidth).

Measures:
  (p1) sync-each device_put of 8 distinct ~1 MB planes
  (p2) async-all device_put + one block at the end
  (p3) async put interleaved with dispatches (the real pass pattern):
       always-prefetch pair flow via Engine.start_pass(prefetch=True)
  (p4) deep pipeline: dispatch ALL 8 passes (async puts + dispatches),
       then finish all -- the -mr steady-state upper bound

Usage: python native/put_pipeline_probe.py > /tmp/putpipe.log 2>&1
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
from approx_counter_tpu.pipeline import Engine  # noqa: E402

W, M, K = 40960, 101, 16
ITERS = 8
rng = np.random.default_rng(11)
prm = Params(input_file="<mem>", output="/tmp/x")
eng = Engine(prm, use_pallas=True)
bufs = [rng.integers(0, 4, (W, M)).astype(np.uint8)
        for _ in range(2 * ITERS + 2)]
planes = []
for b in bufs:
    lo, n_idx, ncols, m = pack_windows_sparse(b, W - 5)
    planes.append(lo)

t0 = time.perf_counter()
eng.start_pass(bufs[-1], W - 5).finish()
log(f"first pass (compile+claim): {time.perf_counter() - t0:.1f}s")
mb = planes[0].nbytes / 1e6

for rnd in range(3):
    # (p1) sync-each
    t0 = time.perf_counter()
    for i in range(ITERS):
        jax.block_until_ready(jax.device_put(planes[i]))
    p1 = (time.perf_counter() - t0) / ITERS
    # (p2) async-all, one block (distinct buffers)
    t0 = time.perf_counter()
    ds = [jax.device_put(planes[ITERS + 0 + i]) for i in range(ITERS)]
    jax.block_until_ready(ds)
    p2 = (time.perf_counter() - t0) / ITERS
    log(f"round {rnd}: (p1) sync-each put {p1 * 1e3:.1f} ms/buf, "
        f"(p2) async-all {p2 * 1e3:.1f} ms/buf ({mb:.2f} MB)")

# (p3) always-prefetch pair flow
rounds = []
for r in range(4):
    t0 = time.perf_counter()
    for i in range(0, 2 * ITERS, 2):
        a = eng.start_pass(bufs[i], W - 5, prefetch=True)
        b = eng.start_pass(bufs[i + 1], W - 5, prefetch=True)
        a.finish()
        b.finish()
    rounds.append((time.perf_counter() - t0) / ITERS)
log(f"(p3) always-prefetch pair: best {min(rounds) * 1e3:.1f} ms/pair "
    f"(rounds {[f'{x * 1e3:.1f}' for x in rounds]})")

# (p4) deep pipeline: dispatch everything, then drain
rounds = []
for r in range(3):
    t0 = time.perf_counter()
    pends = [eng.start_pass(bufs[i], W - 5, prefetch=True)
             for i in range(ITERS)]
    for p in pends:
        p.finish()
    rounds.append((time.perf_counter() - t0) / ITERS)
log(f"(p4) deep pipeline x{ITERS}: best {min(rounds) * 1e3:.1f} ms/pass "
    f"(rounds {[f'{x * 1e3:.1f}' for x in rounds]})")
log("done")
