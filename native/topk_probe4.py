"""Round-4 top-k probe: can lax.approx_max_k (the TPU PartialReduce
lowering) replace the hierarchical lax.top_k pair in _topk_rank?

Byte parity needs EXACT top-cap sets, so approx_max_k is only usable if
recall_target=1.0 is exact in practice; this probe checks exactness
against a full sort on random AND heavy-tie fixtures, and times:

  (t0) current _topk_global (2-level top_k, R=256)
  (t1) flat lax.top_k
  (t2) approx_max_k recall_target=1.0
  (t3) approx_max_k recall_target=0.95 (timing reference only)
  (tp) the full _topk_rank pair as shipped

Usage: python native/topk_probe4.py > /tmp/topk4.log 2>&1
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import log, setup_cache, time_chained  # noqa: E402

setup_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from approx_counter_tpu.count.exact import (  # noqa: E402
    _topk_global,
    _topk_rank,
)

P, CAP = 40960 * 86, 512
ITERS = 8
rng = np.random.default_rng(5)
keys = [jax.device_put(rng.integers(0, 1 << 31, P, dtype=np.int64)
                       .astype(np.int32)) for _ in range(ITERS)]
jax.block_until_ready(keys)
log(f"P = {P}")


@jax.jit
def t0(x):
    v, i = _topk_global(x, CAP)
    return v + i


@jax.jit
def t1(x):
    v, i = jax.lax.top_k(x, CAP)
    return v + i


# approx_max_k needs floats.  Non-negative int32 keys strictly below
# 0x7F800000 (float +inf's bit pattern) bitcast to float32 with ORDER
# PRESERVED (IEEE: non-negative floats compare like their bit patterns,
# and no such pattern is NaN/inf) -- the k=16 default key1 max
# ~(P << 8) ~= 9e8 fits.  Codes (full 32-bit range) do NOT fit, so only
# reduction #1 of _topk_rank could use this.
def _as_f32(x):
    return jax.lax.bitcast_convert_type(x, jnp.float32)


@jax.jit
def t2(x):
    v, i = jax.lax.approx_max_k(_as_f32(x & jnp.int32(0x7F7FFFFF)),
                                CAP, recall_target=1.0)
    return jax.lax.bitcast_convert_type(v, jnp.int32) + i.astype(jnp.int32)


@jax.jit
def t3(x):
    v, i = jax.lax.approx_max_k(_as_f32(x & jnp.int32(0x7F7FFFFF)),
                                CAP, recall_target=0.95)
    return jax.lax.bitcast_convert_type(v, jnp.int32) + i.astype(jnp.int32)


@jax.jit
def tpair(x):
    o1, o4 = _topk_rank(x.astype(jnp.uint32), (~x).astype(jnp.uint32), CAP)
    return o1 + o4


# exactness first (cheap fixtures): approx_max_k must return the exact
# top-CAP VALUE MULTISET to be usable (indices may tie-break differently)
ok_all = True
for name, fix in (
    ("random", rng.integers(0, 1 << 31, P).astype(np.int32)),
    ("heavy ties", np.repeat(
        rng.integers(0, 1000, P // 86).astype(np.int32), 86)),
    ("all equal", np.full(P, 7, np.int32)),
    ("monotone", np.arange(P, dtype=np.int32)),
):
    fix = fix & np.int32(0x7F7FFFFF)  # keep below the inf bit pattern
    want = np.sort(fix)[-CAP:]
    gotf = jax.lax.approx_max_k(
        jax.lax.bitcast_convert_type(jnp.asarray(fix), jnp.float32),
        CAP, recall_target=1.0)[0]
    got = np.sort(np.asarray(
        jax.lax.bitcast_convert_type(gotf, jnp.int32)))
    ok = (got == want).all()
    ok_all &= bool(ok)
    log(f"approx_max_k(recall=1.0) exact on {name}: "
        + ("OK" if ok else f"FAIL ({int((got != want).sum())} diffs)"))

for name, fn in (("(t0) 2-level top_k R=256", t0),
                 ("(t1) flat top_k", t1),
                 ("(t2) approx_max_k r=1.0", t2),
                 ("(t3) approx_max_k r=0.95", t3),
                 ("(tp) _topk_rank pair", tpair)):
    dt = time_chained(lambda i, f=fn: f(keys[i % ITERS]), ITERS)
    log(f"{name:26s}: {dt * 1e3:.2f} ms")
log(f"approx_max_k exact everywhere: {ok_all}")
log("done")
