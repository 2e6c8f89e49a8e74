"""Ranking-selection alternatives, measured on chip (one claim):

  (i)   full 2-key ranking sort over P (what _topk_rank replaced)
  (ii)  flat lax.top_k x2 (the current _topk_rank reductions)
  (iii) 2-level hierarchical top_k x2 (row-wise top_k, then top_k of the
        row winners -- exact for global top-cap selection)

Usage: python native/topk_probe.py > /tmp/topk.log 2>&1
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import log, setup_cache, time_chained  # noqa: E402

setup_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

W, M, K, CAP = 40960, 101, 16, 512
P = W * (M - K + 1)  # 3522560
ITERS = 8
rng = np.random.default_rng(5)

keys = [jax.device_put(rng.integers(0, 1 << 32, P, dtype=np.uint64)
                       .astype(np.uint32)) for _ in range(ITERS)]
codes = [jax.device_put(rng.integers(0, 1 << 32, P, dtype=np.uint64)
                        .astype(np.uint32)) for _ in range(ITERS)]
jax.block_until_ready(keys)


@jax.jit
def rank_sort2(k1, nc):
    o1, o4 = jax.lax.sort([k1, nc], num_keys=2)
    return o1[:CAP] + o4[:CAP]


@jax.jit
def flat_topk2(k1, nc):
    v1, _ = jax.lax.top_k(k1.astype(jnp.int32), CAP)
    v2, _ = jax.lax.top_k(nc.astype(jnp.int32), CAP)
    return v1 + v2


def make_hier(ROWS):
    assert P % ROWS == 0

    @jax.jit
    def hier_topk2(k1, nc):
        out = []
        for x in (k1, nc):
            x2 = x.astype(jnp.int32).reshape(ROWS, P // ROWS)
            v, i = jax.lax.top_k(x2, CAP)              # [ROWS, CAP]
            gi = (jnp.arange(ROWS, dtype=jnp.int32)[:, None]
                  * (P // ROWS) + i).reshape(-1)       # global indices
            v2, j = jax.lax.top_k(v.reshape(-1), CAP)  # winners of winners
            out.append(v2 + gi[j])
        return out[0] + out[1]

    return hier_topk2


for name, fn in (("(i)  2-key ranking sort", rank_sort2),
                 ("(ii) flat top_k x2", flat_topk2),
                 ("(iii) hier top_k x2 (32 rows)", make_hier(32)),
                 ("(iii) hier top_k x2 (64 rows)", make_hier(64)),
                 ("(iii) hier top_k x2 (128 rows)", make_hier(128)),
                 ("(iii) hier top_k x2 (256 rows)", make_hier(256))):
    dt = time_chained(
        lambda i, f=fn: f(keys[i % ITERS], codes[i % ITERS]), ITERS
    )
    log(f"{name:30s}: {dt * 1e3:.2f} ms")
