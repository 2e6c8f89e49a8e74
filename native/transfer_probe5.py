"""Round-5 transfer-cut measurements (VERDICT #3), one chip claim.

The r4 steady state: deep-pipelined plane passes floor at 53.6 ms/pass
(~31 ms marginal H2D per 1.06 MB plane + 13.4 ms compute, serialized --
async puts do not overlap device compute on this tunnel).  Round 5 cuts
the per-pass H2D to a ~160 KB index vector via the device window pool
(pipeline.Engine.build_pool): ship every eligible read's two cut windows
once, gather each pass's batch on device.

Measures (reference defaults, sn=40000, sl=100, k=16, limit=500):
  (q0) full-pass device compute, chained (rowsort exact stage) -- the
       round-5 update of r4's 13.4 ms
  (q1) plane deep pipeline x8 (r4 p4 baseline, same session)
  (q2) POOL deep pipeline x8 (the -mr 4 steady state; VERDICT target
       <= ~40 ms/pass from 54.5)
  (q3) POOL always-prefetch pair flow (the single-run start+end pattern)
  (q4) concat experiment (VERDICT #3a): async put of 2 x 1.06 MB planes
       vs ONE 2.12 MB concatenated buffer -- is a fixed per-put cost
       still being paid twice after async batching?

Usage: python native/transfer_probe5.py > /tmp/transfer5.log 2>&1
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
from approx_counter_tpu.io.fastx import Reads  # noqa: E402
from approx_counter_tpu.params import Params  # noqa: E402
from approx_counter_tpu.pipeline import CT, Engine, _round_up  # noqa: E402

SN, SL, K, LIMIT = 40000, 100, 16, 500
W, M = 40960, SL + 1
N_READS, READ_LEN = 60000, 210
ITERS = 8
rng = np.random.default_rng(11)

# synthetic read set: every read eligible (len >= 2*sl)
buf = rng.integers(0, 4, N_READS * READ_LEN).astype(np.uint8)
offsets = np.arange(N_READS + 1, dtype=np.int64) * READ_LEN
reads = Reads(buf=buf, offsets=offsets)

prm = Params(input_file="<mem>", output="/tmp/x", sn=SN, sl=SL, k=K,
             limit=LIMIT)
eng = Engine(prm, use_pallas=True)

bufs = [rng.integers(0, 4, (W, M)).astype(np.uint8)
        for _ in range(ITERS + 2)]

t0 = time.perf_counter()
eng.start_pass(bufs[-1], W - 5).finish()
log(f"first pass (compile+claim): {time.perf_counter() - t0:.1f}s")

# (q0) full-pass device compute, chained: pre-put sparse buffers,
# dispatch chained, ONE fetch -- the r4 pass_decomp4b (Fe) pattern
cap = max(512, _round_up(min(LIMIT, 1 << 20), CT))
devs = []
for b in bufs[:ITERS]:
    lo, n_idx, ncols, m = pack_windows_sparse(b, W - 5)
    ext = np.empty(len(n_idx) + 2, np.int32)
    ext[:-2] = n_idx
    ext[-2] = W - 5
    ext[-1] = ncols
    devs.append((jax.device_put(lo), jax.device_put(ext)))
jax.block_until_ready([d for pair in devs for d in pair])
fn = eng._fused_fn(cap, M, "sparse")
tail = eng._tail_dev()
np.asarray(fn(*devs[0], *tail))  # warm this executable
best = None
for _ in range(4):
    t0 = time.perf_counter()
    acc = None
    for i in range(ITERS):
        o = fn(*devs[i], *tail)
        acc = o if acc is None else acc + o
    np.asarray(acc)
    dt = (time.perf_counter() - t0) / ITERS
    best = dt if best is None else min(best, dt)
log(f"(q0) full-pass device compute (chained, rowsort): {best * 1e3:.2f} ms")

# (q1) plane deep pipeline x8 (r4 baseline, same session)
rounds = []
for _ in range(3):
    t0 = time.perf_counter()
    pends = [eng.start_pass(bufs[i], W - 5, prefetch=True)
             for i in range(ITERS)]
    for p in pends:
        p.finish()
    rounds.append((time.perf_counter() - t0) / ITERS)
log(f"(q1) plane deep pipeline x{ITERS}: best {min(rounds) * 1e3:.1f} "
    f"ms/pass (rounds {[f'{x * 1e3:.1f}' for x in rounds]})")

# ---- pool ----
t0 = time.perf_counter()
assert eng.build_pool(reads, SL)
jax.block_until_ready(list(eng._pool["pools"].values()))
log(f"pool build (E={eng._pool['E']}, one-time): "
    f"{(time.perf_counter() - t0) * 1e3:.1f} ms")

chosens = [rng.permutation(N_READS)[:SN] for _ in range(ITERS + 1)]
t0 = time.perf_counter()
eng.start_pass_pool(chosens[-1], SN, end=False).finish()  # warm pool exe
log(f"pool first pass (compile): {time.perf_counter() - t0:.1f}s")

# (q2) pool deep pipeline x8 (the -mr 4 steady state)
rounds = []
for _ in range(4):
    t0 = time.perf_counter()
    pends = [eng.start_pass_pool(chosens[i], SN, end=bool(i % 2),
                                 prefetch=True) for i in range(ITERS)]
    for p in pends:
        p.finish()
    rounds.append((time.perf_counter() - t0) / ITERS)
log(f"(q2) POOL deep pipeline x{ITERS}: best {min(rounds) * 1e3:.1f} "
    f"ms/pass (rounds {[f'{x * 1e3:.1f}' for x in rounds]})")

# (q3) pool always-prefetch pair flow
rounds = []
for _ in range(4):
    t0 = time.perf_counter()
    for i in range(0, ITERS, 2):
        a = eng.start_pass_pool(chosens[i], SN, end=False, prefetch=True)
        b = eng.start_pass_pool(chosens[i + 1], SN, end=True, prefetch=True)
        a.finish()
        b.finish()
    rounds.append((time.perf_counter() - t0) / (ITERS // 2))
log(f"(q3) POOL pair flow: best {min(rounds) * 1e3:.1f} ms/pair "
    f"(rounds {[f'{x * 1e3:.1f}' for x in rounds]})")

# (q4) concat-put experiment: 2 planes vs 1 doubled buffer, async
planes = []
for b in bufs[:ITERS]:
    lo, n_idx, ncols, m = pack_windows_sparse(b, W - 5)
    planes.append(lo)
pairs2 = [np.concatenate([planes[i], planes[(i + 1) % ITERS]])
          for i in range(ITERS)]
for _ in range(3):
    t0 = time.perf_counter()
    ds = [jax.device_put(p) for p in planes]
    jax.block_until_ready(ds)
    t_two = (time.perf_counter() - t0) / (ITERS // 2)
    t0 = time.perf_counter()
    ds = [jax.device_put(p) for p in pairs2[: ITERS // 2]]
    jax.block_until_ready(ds)
    t_one = (time.perf_counter() - t0) / (ITERS // 2)
    log(f"(q4) pair H2D: two {planes[0].nbytes/1e6:.2f} MB puts "
        f"{t_two * 1e3:.1f} ms vs one {pairs2[0].nbytes/1e6:.2f} MB put "
        f"{t_one * 1e3:.1f} ms")
log("done")
