"""Round-4 device measurement batch (ONE chip claim):

Part 1 -- attribute the r3 "unpack + rank + dispatch + fetch ~= 23 ms"
slice (VERDICT #1) and A/B the two cuts:
  (u)  sparse unpack alone (device-resident packed planes)
  (ut) transposed sparse unpack alone
  (tr) [n,m] -> [m,n] uint8 transpose alone
  (rk) rank_with_zero_counts alone (cap-sized 6-operand sort)
  (pq) build_peq + build_sliced_planes alone
  (f0) fused pass, OLD layout (untransposed, dict output), device inputs
  (f1) fused pass, transposed layout, dict output
  (f2) fused pass, transposed + packed single-buffer output
  (fd) fetch experiment: device_get(dict of ~10 arrays) vs one
       concatenated vector of the same bytes
  (h0/h2) host-input passes: OLD vs NEW production config

Part 2 -- kernel prologue specialization (VERDICT #6), interleaved A/B.

Part 3 -- exact-stage floor (VERDICT #7): the P=3.5M single-key sort
alone, is_stable=False variant, the hierarchical top-k pair, and the
full exact stage.

Usage: python native/pass_decomp4.py > /tmp/decomp4.log 2>&1
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
    unpack_windows_sparse_jnp,
    unpack_windows_sparse_t_jnp,
)
from approx_counter_tpu.count.approx import rank_with_zero_counts  # noqa: E402
from approx_counter_tpu.kernels.bpm import (  # noqa: E402
    approx_counts_pallas_sliced,
    build_peq,
    build_sliced_planes,
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
packed_ext = []  # (plane, n_idx+tail-scalars) -- the production 2-buffer arg set
for i in range(ITERS + 1):
    lo, n_idx, ncols, m = pack_windows_sparse(bufs[i], W - 5)
    packed.append((jax.device_put(lo), jax.device_put(n_idx),
                   np.int32(ncols)))
    n_idx_ext = np.empty(len(n_idx) + 2, np.int32)
    n_idx_ext[:-2] = n_idx
    n_idx_ext[-2] = W - 5
    n_idx_ext[-1] = ncols
    packed_ext.append((packed[-1][0], jax.device_put(n_idx_ext)))
jax.block_until_ready([p[1] for p in packed_ext])
nv = np.int32(W - 5)

eng = Engine(prm, use_pallas=True)

# warm (claims the chip) -- new production config
t0 = time.perf_counter()
eng.start_pass(bufs[-1], W - 5).finish()
log(f"first pass (compile+claim): {time.perf_counter() - t0:.1f}s")

# ---------------- Part 1: micro attributions ----------------


@jax.jit
def just_unpack(lo, n_idx, ncols):
    w = unpack_windows_sparse_jnp(lo, n_idx, nv, ncols, M)
    return jnp.sum(w.astype(jnp.int32), axis=0)  # small fence output


@jax.jit
def just_unpack_t(lo, n_idx, ncols):
    w = unpack_windows_sparse_t_jnp(lo, n_idx, nv, ncols, M)
    return jnp.sum(w.astype(jnp.int32), axis=1)


@jax.jit
def unpack_plus_transpose(lo, n_idx, ncols):
    w = unpack_windows_sparse_jnp(lo, n_idx, nv, ncols, M)
    wt = jnp.transpose(w, (1, 0))
    return jnp.sum(wt.astype(jnp.int32), axis=1)


wins_dev = [jax.device_put(b) for b in bufs]
jax.block_until_ready(wins_dev)


@jax.jit
def just_transpose(w):
    return jnp.sum(jnp.transpose(w, (1, 0)).astype(jnp.int32), axis=1)


codes = rng.integers(0, 1 << (2 * K), CAP, dtype=np.uint64)
chi = (codes >> np.uint64(32)).astype(np.uint32)
clo = (codes & np.uint64(0xFFFFFFFF)).astype(np.uint32)
sel_valid = np.ones(CAP, bool)
cnt_bufs = [jax.device_put(rng.integers(0, 3 * W, CAP).astype(np.int32))
            for _ in range(ITERS + 1)]
jax.block_until_ready(cnt_bufs)


@jax.jit
def just_rank(counts):
    return rank_with_zero_counts(jnp.asarray(chi), jnp.asarray(clo),
                                 counts, jnp.asarray(sel_valid), K)[2]


peq_bufs = [jax.device_put(np.stack([chi ^ np.uint32(i), clo], -1)
                           .astype(np.uint32)) for i in range(ITERS + 1)]


@jax.jit
def just_planes(hilo):
    peq = build_peq(hilo[:, 0], hilo[:, 1], K)
    p0, p1 = build_sliced_planes(peq, K)
    return p0[:, 0] + p1[:, 0]


for name, fn, srcs in (
    ("(u)  sparse unpack [n,m]", just_unpack, packed),
    ("(ut) sparse unpack [m,n]", just_unpack_t, packed),
    ("(u+t) unpack + transpose", unpack_plus_transpose, packed),
    ("(tr) transpose alone", just_transpose, wins_dev),
    ("(rk) rank (cap sort)", just_rank, cnt_bufs),
    ("(pq) peq + planes", just_planes, peq_bufs),
):
    if srcs is packed:
        dt = time_chained(lambda i, f=fn: f(*packed[i % len(packed)]),
                          ITERS)
    else:
        dt = time_chained(lambda i, f=fn, s=srcs: f(s[i % len(s)]), ITERS)
    log(f"{name:28s}: {dt * 1e3:.2f} ms")

# fused-pass variants, device-resident inputs, fetch-each (the real
# per-pass pattern): old layout / transposed / transposed+packed
for tag, tr, po in (("(f0) fused old layout+dict", False, False),
                    ("(f1) fused transposed+dict", True, False),
                    ("(f2) fused transposed+packed", True, True)):
    fn = eng._fused_fn(CAP, M, "sparse", transposed=tr, packed_out=po)
    tail = eng._tail_dev()
    out = fn(*packed_ext[-1], *tail)
    jax.block_until_ready(out)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(ITERS):
            out = fn(*packed_ext[i], *tail)
            jax.device_get(out)
        dt = (time.perf_counter() - t0) / ITERS
        best = dt if best is None else min(best, dt)
    log(f"{tag:28s}: {best * 1e3:.1f} ms")

# fetch-granularity experiment: same bytes, dict-of-10 vs one vector
dict_dev = {f"a{i}": jax.device_put(rng.integers(0, 99, CAP)
                                    .astype(np.uint32))
            for i in range(10)}
vec_dev = jax.device_put(rng.integers(0, 99, 10 * CAP).astype(np.uint32))
jax.block_until_ready(list(dict_dev.values()))
jax.block_until_ready(vec_dev)
for name, obj in (("dict of 10 x [512]", dict_dev),
                  ("one [5120] vector", vec_dev)):
    best = None
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            jax.device_get(obj)
        dt = (time.perf_counter() - t0) / ITERS
        best = dt if best is None else min(best, dt)
    log(f"(fd) device_get {name:20s}: {best * 1e3:.2f} ms")

# host-input production passes: old vs new switches
for tag, tr, po in (("(h0) host pass OLD config", False, False),
                    ("(h2) host pass NEW config", True, True)):
    eng.transposed, eng.packed_out = tr, po
    eng.start_pass(bufs[-1], W - 5).finish()  # warm this config
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(ITERS):
            eng.start_pass(bufs[i], W - 5).finish()
        dt = (time.perf_counter() - t0) / ITERS
        best = dt if best is None else min(best, dt)
    log(f"{tag:28s}: {best * 1e3:.1f} ms")
eng.transposed = eng.packed_out = True

# pipelined pair with the new config
t0 = time.perf_counter()
for i in (0, 2, 4):
    p1 = eng.start_pass(bufs[i], W - 5)
    p2 = eng.start_pass(bufs[i + 1], W - 5, prefetch=True)
    p1.finish()
    p2.finish()
log(f"(hp) pipelined pair NEW:      "
    f"{(time.perf_counter() - t0) / 3 * 1e3:.1f} ms/pair")

# ---------------- Part 2: kernel prologue A/B ----------------
peq = jax.device_put(build_peq(chi, clo, K))
wts = [jax.device_put(np.ascontiguousarray(b.T)) for b in bufs]
wv = jax.device_put(np.ones(W, bool))
jax.block_until_ready(wts)


def run_base(i):
    return approx_counts_pallas_sliced(
        peq, wts[i % len(wts)], wv, K, ctw=8, wt=256, prologue=False)


def run_pro(i):
    return approx_counts_pallas_sliced(
        peq, wts[i % len(wts)], wv, K, ctw=8, wt=256, prologue=True)


# interleaved best-of: absolutes drift between processes; ratios stable
np.asarray(run_base(ITERS))
np.asarray(run_pro(ITERS))
for rnd in range(3):
    ts = {}
    for name, fn in (("base", run_base), ("prologue", run_pro)):
        t0 = time.perf_counter()
        acc = None
        for i in range(ITERS):
            o = fn(i)
            acc = o if acc is None else acc + o
        np.asarray(acc)
        ts[name] = (time.perf_counter() - t0) / ITERS
    log(f"(k) kernel A/B round {rnd}: base {ts['base'] * 1e3:.2f} ms, "
        f"prologue {ts['prologue'] * 1e3:.2f} ms "
        f"({ts['base'] / ts['prologue']:.3f}x)")

# correctness spot-check on chip
np.testing.assert_array_equal(np.asarray(run_base(0)),
                              np.asarray(run_pro(0)))
log("(k) prologue bit-exact vs base on chip: OK")

# ---------------- Part 3: exact-stage sort floor ----------------
P = W * (M - K + 1)
keys = [jax.device_put(rng.integers(0, 1 << 32, P, dtype=np.uint64)
                       .astype(np.uint32)) for _ in range(ITERS)]
jax.block_until_ready(keys)


@jax.jit
def sort_stable(x):
    (s,) = jax.lax.sort([x], num_keys=1, is_stable=True)
    return s[:CAP]


@jax.jit
def sort_unstable(x):
    (s,) = jax.lax.sort([x], num_keys=1, is_stable=False)
    return s[:CAP]


@jax.jit
def sort2_stable(x):
    a, b = jax.lax.sort([x, ~x], num_keys=2, is_stable=True)
    return a[:CAP] + b[:CAP]


@jax.jit
def sort2_unstable(x):
    a, b = jax.lax.sort([x, ~x], num_keys=2, is_stable=False)
    return a[:CAP] + b[:CAP]


from approx_counter_tpu.count.exact import _topk_rank  # noqa: E402


@jax.jit
def topk_pair(x):
    o1, o4 = _topk_rank(x, ~x, CAP)
    return o1 + o4


for name, fn in (
    ("sort 3.5M stable", sort_stable),
    ("sort 3.5M unstable", sort_unstable),
    ("2-key sort stable", sort2_stable),
    ("2-key sort unstable", sort2_unstable),
    ("_topk_rank pair", topk_pair),
):
    dt = time_chained(lambda i, f=fn: f(keys[i % ITERS]), ITERS)
    log(f"(x) {name:22s}: {dt * 1e3:.2f} ms")

from approx_counter_tpu.count.exact import exact_count_select  # noqa: E402


def full_exact(i):
    out = exact_count_select(
        wins_dev[i % len(wins_dev)], nv, K, np.int32(200),
        np.zeros(0, np.uint32), np.zeros(0, np.uint32),
        np.int32(500), np.int32(0), cap=CAP, n_forbidden=0,
        use_solid=False,
    )
    return out["sel_count"]


dt = time_chained(full_exact, ITERS)
log(f"(x) full exact stage        : {dt * 1e3:.2f} ms")
log("done")
