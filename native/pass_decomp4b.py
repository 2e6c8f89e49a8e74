"""Round-4 session B: attribute the fused-pass composition overhead.

Session A (pass_decomp4.py) found the transposed fused pass costs ~35 ms
device-side while its parts sum to ~20 ms (exact 13.3 + kernel 6.3 +
small unpack/rank/peq).  This session builds the pass INCREMENTALLY --
every program timed with the chained-1-fetch protocol (per-call issue
overlaps compute) on device-resident packed inputs:

  (Fa) unpack_t only
  (Fb) unpack_t + exact(transposed)           [is_stable=False landed]
  (Fc) unpack_t + kernel w/ CONSTANT peq
  (Fe) full fused (unpack + exact + kernel + rank)
  (Fs) SPLIT pass: program 1 = unpack+exact (returns windows_t + sel),
       program 2 = kernel + rank consuming program 1's device outputs --
       two async dispatches, zero extra host round trips

plus the updated exact stage alone, and an interleaved OLD/NEW host-pass
A/B (session A's sequential h0/h2 readings disagreed with the
device-resident f0/f1/f2 ordering -- suspect host throttle).

Usage: python native/pass_decomp4b.py > /tmp/decomp4b.log 2>&1
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import log, setup_cache, time_chained  # noqa: E402

setup_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from approx_counter_tpu.core.codec import (  # noqa: E402
    pack_windows_sparse,
    unpack_windows_sparse_t_jnp,
)
from approx_counter_tpu.count.approx import rank_with_zero_counts  # noqa: E402
from approx_counter_tpu.count.exact import (  # noqa: E402
    exact_count_select_rows,
)
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

bufs = [rng.integers(0, 4, (W, M)).astype(np.uint8)
        for _ in range(ITERS + 1)]
packed = []
for i in range(ITERS + 1):
    lo, n_idx, ncols, m = pack_windows_sparse(bufs[i], W - 5)
    packed.append((jax.device_put(lo), jax.device_put(n_idx),
                   np.int32(ncols)))
jax.block_until_ready([p[0] for p in packed])
nv = np.int32(W - 5)
thr = np.int32(200)
fhi = np.zeros(0, np.uint32)
flo = np.zeros(0, np.uint32)

codes = rng.integers(0, 1 << (2 * K), CAP, dtype=np.uint64)
chi = (codes >> np.uint64(32)).astype(np.uint32)
clo = (codes & np.uint64(0xFFFFFFFF)).astype(np.uint32)
const_peq = build_peq(chi, clo, K)

eng = Engine(prm, use_pallas=True)
t0 = time.perf_counter()
eng.start_pass(bufs[-1], W - 5).finish()
log(f"first pass (compile+claim): {time.perf_counter() - t0:.1f}s")


def _row_mask(n_valid, Wn):
    return jax.lax.broadcasted_iota(jnp.int32, (Wn,), 0) < n_valid


@jax.jit
def Fa(lo, n_idx, ncols):
    wt_ = unpack_windows_sparse_t_jnp(lo, n_idx, nv, ncols, M)
    return jnp.sum(wt_.astype(jnp.int32), axis=1)


@jax.jit
def Fb(lo, n_idx, ncols):
    wt_ = unpack_windows_sparse_t_jnp(lo, n_idx, nv, ncols, M)
    ex = exact_count_select_rows(
        wt_, _row_mask(nv, W), K, thr, fhi, flo, np.int32(500),
        np.int32(0), cap=CAP, n_forbidden=0, use_solid=False,
        transposed=True,
    )
    return ex["sel_count"]


@jax.jit
def Fc(lo, n_idx, ncols):
    wt_ = unpack_windows_sparse_t_jnp(lo, n_idx, nv, ncols, M)
    return approx_counts(jnp.asarray(const_peq), wt_, _row_mask(nv, W), K,
                         use_pallas=True)


@jax.jit
def Fe(lo, n_idx, ncols):
    wt_ = unpack_windows_sparse_t_jnp(lo, n_idx, nv, ncols, M)
    rm = _row_mask(nv, W)
    ex = exact_count_select_rows(
        wt_, rm, K, thr, fhi, flo, np.int32(500), np.int32(0),
        cap=CAP, n_forbidden=0, use_solid=False, transposed=True,
    )
    peq = build_peq(ex["sel_hi"], ex["sel_lo"], K)
    counts = approx_counts(peq, wt_, rm, K, use_pallas=True)
    _, _, a_cnt, _ = rank_with_zero_counts(
        ex["sel_hi"], ex["sel_lo"], counts, ex["sel_valid"], K)
    return a_cnt


@jax.jit
def Fs1(lo, n_idx, ncols):
    wt_ = unpack_windows_sparse_t_jnp(lo, n_idx, nv, ncols, M)
    ex = exact_count_select_rows(
        wt_, _row_mask(nv, W), K, thr, fhi, flo, np.int32(500),
        np.int32(0), cap=CAP, n_forbidden=0, use_solid=False,
        transposed=True,
    )
    return wt_, ex["sel_hi"], ex["sel_lo"], ex["sel_valid"]


@jax.jit
def Fs2(wt_, sel_hi, sel_lo, sel_valid):
    peq = build_peq(sel_hi, sel_lo, K)
    counts = approx_counts(peq, wt_, _row_mask(nv, W), K, use_pallas=True)
    _, _, a_cnt, _ = rank_with_zero_counts(
        sel_hi, sel_lo, counts, sel_valid, K)
    return a_cnt


def Fs(lo, n_idx, ncols):
    return Fs2(*Fs1(lo, n_idx, ncols))


for name, fn in (("(Fa) unpack_t only", Fa),
                 ("(Fb) unpack+exact", Fb),
                 ("(Fc) unpack+kernel", Fc),
                 ("(Fe) full fused", Fe),
                 ("(Fs) split 2-dispatch", Fs)):
    dt = time_chained(lambda i, f=fn: f(*packed[i % len(packed)]), ITERS)
    log(f"{name:24s}: {dt * 1e3:.2f} ms")

# updated exact stage alone (is_stable=False landed)
wins_dev = [jax.device_put(np.ascontiguousarray(b.T)) for b in bufs]
jax.block_until_ready(wins_dev)


def run_exact(i):
    ex = exact_count_select_rows(
        wins_dev[i % len(wins_dev)], _row_mask(nv, W), K, thr, fhi, flo,
        np.int32(500), np.int32(0), cap=CAP, n_forbidden=0,
        use_solid=False, transposed=True,
    )
    return ex["sel_count"]


dt = time_chained(run_exact, ITERS)
log(f"(x) exact stage (unstable sorts): {dt * 1e3:.2f} ms")

# host-pass A/B, interleaved rounds (old vs new switches)
res = {"old": [], "new": []}
for rnd in range(3):
    for tag, tr, po in (("old", False, False), ("new", True, True)):
        eng.transposed, eng.packed_out = tr, po
        if rnd == 0:
            eng.start_pass(bufs[-1], W - 5).finish()  # warm config
        t0 = time.perf_counter()
        for i in range(ITERS):
            eng.start_pass(bufs[i], W - 5).finish()
        res[tag].append((time.perf_counter() - t0) / ITERS)
for tag in ("old", "new"):
    best = min(res[tag]) * 1e3
    log(f"(h) host pass {tag} config: best {best:.1f} ms "
        f"(rounds {[f'{x * 1e3:.1f}' for x in res[tag]]})")

eng.transposed = eng.packed_out = True
t0 = time.perf_counter()
for i in (0, 2, 4):
    p1 = eng.start_pass(bufs[i], W - 5)
    p2 = eng.start_pass(bufs[i + 1], W - 5, prefetch=True)
    p1.finish()
    p2.finish()
log(f"(hp) pipelined pair NEW: {(time.perf_counter() - t0) / 3 * 1e3:.1f}"
    " ms/pair")

# split-dispatch inside the real Engine shape: does a 2-program pass beat
# the monolith end-to-end on host inputs?  (manual: pack + put + Fs)
best = None
for _ in range(3):
    t0 = time.perf_counter()
    for i in range(ITERS):
        lo, n_idx, ncols, _ = pack_windows_sparse(bufs[i], W - 5)
        out = Fs(jax.device_put(lo), jax.device_put(n_idx),
                 np.int32(ncols))
        jax.device_get(out)
    dt = (time.perf_counter() - t0) / ITERS
    best = dt if best is None else min(best, dt)
log(f"(hs) host-input split pass: {best * 1e3:.1f} ms")
log("done")
