"""Device timing of the exact stage alone at reference-default shape --
checks the top-k ranking path (count/exact.py _topk_rank) against the
round-2 full-sort figure (~19 ms exact stage, ~9 ms ranking sort).

Usage: python native/exact_timing.py > /tmp/exact.log 2>&1
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import log, setup_cache, time_chained  # noqa: E402

import jax  # noqa: E402

setup_cache()

from approx_counter_tpu.count.exact import exact_count_select  # noqa: E402

W, M, K, CAP = 40960, 101, 16, 512
ITERS = 10

rng = np.random.default_rng(12345)
NBUF = ITERS + 1
wins = [
    jax.device_put(rng.integers(0, 4, (W, M)).astype(np.uint8))
    for _ in range(NBUF)
]
fhi = np.empty(0, np.uint32)
flo = np.empty(0, np.uint32)


def run(i):
    out = exact_count_select(
        wins[i % NBUF], np.int32(W), K, np.int32(1 << 20), fhi, flo,
        np.int32(500), np.int32(0), cap=CAP, n_forbidden=0, use_solid=False,
    )
    return out["sel_count"]


dt = time_chained(run, ITERS)
log(f"exact stage (pack+sort+RLE+filters+topk-rank, device): "
    f"{dt * 1e3:.2f} ms")
