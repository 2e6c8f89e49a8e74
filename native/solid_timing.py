"""Solid-mode pass timing A/B on hardware (r3 weak #6: the un-fused
two-dispatch solid path's cost was never measured; r4 fused it).

  (s0) OLD pattern: exact_count_select dispatch -> n_keep fetch ->
       approx_count_rank dispatch -> fetch (two device round trips,
       recreated from the pre-r4 building blocks)
  (s1) NEW production: Engine.start_pass(...).finish() with solid_km>0
       (one fused dispatch + one fetch, cap-regrowth loop)

Both at reference-default shapes with ~700 solid candidates (forces one
regrowth in s1 -- the honest worst case for the fused path).

Usage: python native/solid_timing.py > /tmp/solid.log 2>&1
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import log, setup_cache  # noqa: E402

setup_cache()

import jax  # noqa: E402

from approx_counter_tpu.count.approx import approx_count_rank  # noqa: E402
from approx_counter_tpu.count.exact import exact_count_select  # noqa: E402
from approx_counter_tpu.params import Params  # noqa: E402
from approx_counter_tpu.pipeline import Engine  # noqa: E402

W, M, K = 40960, 101, 16
SOLID = 18  # ~count threshold chosen so ~500-900 candidates pass
ITERS = 6
rng = np.random.default_rng(23)

# batches with a planted repeated vocabulary so solid counts exist:
# ~2000 distinct 16-mers, each appearing ~tens of times
vocab = rng.integers(0, 4, (2000, K)).astype(np.uint8)
bufs = []
for _ in range(ITERS + 1):
    w = rng.integers(0, 4, (W, M)).astype(np.uint8)
    rows = rng.integers(0, W, 4000)
    pos = rng.integers(0, M - K + 1, 4000)
    vid = rng.integers(0, 2000, 4000)
    for r, p, v in zip(rows, pos, vid):
        w[r, p: p + K] = vocab[v]
    bufs.append(w)

prm = Params(input_file="<mem>", output="/tmp/x", k=K, sl=M - 1,
             solid_km=SOLID, limit=1000, param_lc=1.0)
eng = Engine(prm, use_pallas=True)

t0 = time.perf_counter()
(_, _), (_, _), stats = eng.start_pass(bufs[-1], W - 5).finish()
log(f"first pass (compile+claim): {time.perf_counter() - t0:.1f}s; "
    f"n_keep={stats['n_keep']} (cap regrowth {'YES' if stats['n_keep'] > 512 else 'no'})")

# (s1) fused production path
best = None
for _ in range(3):
    t0 = time.perf_counter()
    for i in range(ITERS):
        eng.start_pass(bufs[i], W - 5).finish()
    dt = (time.perf_counter() - t0) / ITERS
    best = dt if best is None else min(best, dt)
log(f"(s1) fused solid pass:        {best * 1e3:.1f} ms")

# (s0) the pre-r4 two-dispatch pattern on the same batches
cap0 = 1024  # pre-grown (generous to the old path: no regrowth loop)


def old_pass(w):
    dev_windows = eng.device_windows(w, W - 5)
    out = exact_count_select(
        dev_windows, np.int32(W - 5), K, eng.lc_sum_thr, eng.fhi, eng.flo,
        np.int32(prm.limit), np.int32(SOLID), cap=cap0, n_forbidden=0,
        use_solid=True,
    )
    fetched = jax.device_get(out)          # round trip 1
    n_keep = int(fetched["n_keep"])
    assert n_keep <= cap0
    dev_approx = approx_count_rank(
        dev_windows, np.int32(W - 5), out["sel_hi"], out["sel_lo"],
        out["sel_valid"], K, ct=None, wt=None, use_pallas=True,
    )
    jax.device_get(dev_approx)             # round trip 2
    return n_keep


old_pass(bufs[-1])  # warm
best = None
for _ in range(3):
    t0 = time.perf_counter()
    for i in range(ITERS):
        old_pass(bufs[i])
    dt = (time.perf_counter() - t0) / ITERS
    best = dt if best is None else min(best, dt)
log(f"(s0) two-dispatch solid pass: {best * 1e3:.1f} ms")
log("done")
