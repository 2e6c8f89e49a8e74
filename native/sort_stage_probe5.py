"""Round-5 Pallas-sort feasibility microprobe (one claim).

Decision gate for hand-writing a blocked bitonic sort to beat XLA's
5.48 ms flat 1-key sort at P=3.5M (BASELINE round-5 floor argument):
a 4M-element blocked bitonic sort needs ~210 in-VMEM compare-exchange
stages per 4 MB block (4 blocks) + ~6 HBM passes + ~20 tile-transpose
sweeps for the sub-lane distances.  The op-count model prices the
stages at ~0.9 ms total on the VPU; this probe MEASURES the achievable
stage rate with a representative Pallas kernel:

  (s1) 210 row-level compare-exchange stages on a resident [8192, 128]
       int32 block (grid=4 -> 16 MB total), fixed distance -- the pure
       min/max/select throughput.
  (s2) same + a [128, 128] tile-transpose sweep every 20 stages -- the
       real network's lane-dimension handling cost.

If (s1)/(s2) land >= ~4-5 ms, a full sort cannot beat XLA's 5.48 ms
(it still needs cross-block merges and exactness bookkeeping) and the
idea is a measured negative.  If ~1-2 ms, a real implementation is
worth the effort.

Usage: python native/sort_stage_probe5.py > /tmp/sortstage5.log 2>&1
"""
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import log, setup_cache, time_chained  # noqa: E402

setup_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

ROWS, LANES = 8192, 128          # 4 MB int32 block
BLOCKS = 4                       # 16 MB total = the padded P=4M array
STAGES = 210                     # in-block bitonic network depth (2^20)
ITERS = 6


def make_probe(transpose_every: int):
    def kernel(x_ref, o_ref):
        x = x_ref[:]

        def stage(i, x):
            # representative compare-exchange at an 8-row distance:
            # [G, 2, 8, 128] min/max over the partner axis
            y = x.reshape(ROWS // 16, 2, 8, LANES)
            a = jnp.minimum(y[:, 0], y[:, 1])
            b = jnp.maximum(y[:, 0], y[:, 1])
            x = jnp.concatenate([a[:, None], b[:, None]], axis=1)
            return x.reshape(ROWS, LANES)

        if transpose_every:
            def level(j, x):
                x = jax.lax.fori_loop(0, transpose_every, stage, x)
                # lane-dimension handling: transpose each 128x128 tile
                t = x.reshape(ROWS // LANES, LANES, LANES)
                t = jnp.transpose(t, (0, 2, 1))
                return t.reshape(ROWS, LANES)

            x = jax.lax.fori_loop(0, STAGES // transpose_every, level, x)
        else:
            x = jax.lax.fori_loop(0, STAGES, stage, x)
        o_ref[:] = x

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(BLOCKS,),
            in_specs=[pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BLOCKS * ROWS, LANES),
                                           jnp.int32),
        )(x)[:64, :1]

    return run


rng = np.random.default_rng(7)
xs = [jax.device_put(rng.integers(0, 1 << 31, (BLOCKS * ROWS, LANES))
                     .astype(np.int32)) for _ in range(ITERS + 1)]
jax.block_until_ready(xs)

log(f"model: {STAGES} stages x {BLOCKS} x {ROWS}x{LANES} int32 "
    f"(~{STAGES * BLOCKS * ROWS * LANES * 4 / 1e9:.1f} G elem-stage ops)")
for name, te in (("(s1) stages only", 0), ("(s2) + transpose/20", 20)):
    fn = make_probe(te)
    dt = time_chained(lambda i, f=fn: f(xs[i % ITERS]), ITERS)
    log(f"{name:22s}: {dt * 1e3:.2f} ms "
        f"({STAGES * BLOCKS * ROWS * LANES / dt / 1e12:.2f} T elem-stages/s)")

# reference point in the same session: XLA flat 1-key sort at P=3.5M
P = 3522560
ys = [jax.device_put(rng.integers(0, 1 << 32, P, dtype=np.uint64)
                     .astype(np.uint32)) for _ in range(ITERS + 1)]


@jax.jit
def xla_sort(y):
    (s,) = jax.lax.sort([y], num_keys=1, is_stable=False)
    return s[:64]


dt = time_chained(lambda i: xla_sort(ys[i % ITERS]), ITERS)
log(f"XLA flat 1-key sort P=3.5M (same session): {dt * 1e3:.2f} ms")
log("done")
