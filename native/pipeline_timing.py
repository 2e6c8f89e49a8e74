"""A/B of the two-pass (start+end) driver flow: sequential dispatch/fetch
vs the pipelined path (_PendingPass: end pass's pack + H2D + dispatch
overlapped with the start pass's device compute).

Full-pass latency on this stack is transfer/dispatch-dominated (round 3:
94.7 ms of which kernel ~4.6 ms, exact ~12 ms), so overlapping the second
pass's host work + H2D behind the first pass's compute should hide most of
its non-compute cost.

Usage: python native/pipeline_timing.py > /tmp/pipe.log 2>&1
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import log, setup_cache  # noqa: E402

setup_cache()

from approx_counter_tpu.params import Params  # noqa: E402
from approx_counter_tpu.pipeline import Engine  # noqa: E402

W, M = 40960, 101
ITERS = 6  # pass *pairs* per trial
TRIALS = 3

rng = np.random.default_rng(7)
prm = Params(input_file="<mem>", output="/tmp/x")
eng = Engine(prm, use_pallas=True)

bufs = [rng.integers(0, 4, (W, M)).astype(np.uint8)
        for _ in range(2 * ITERS + 1)]

t0 = time.perf_counter()
eng.start_pass(bufs[-1], W - 5).finish()
log(f"first pass (compile+claim): {time.perf_counter() - t0:.1f}s")


def run(mode: str) -> float:
    best = None
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        for i in range(ITERS):
            a, b = bufs[2 * i], bufs[2 * i + 1]
            if mode == "seq":
                eng.start_pass(a, W - 5).finish()
                eng.start_pass(b, W - 5).finish()
            else:
                p1 = eng.start_pass(a, W - 5)
                p2 = eng.start_pass(b, W - 5, prefetch=True)
                p1.finish()
                p2.finish()
        dt = (time.perf_counter() - t0) / ITERS
        best = dt if best is None else min(best, dt)
    return best


# interleave the two modes so drift hits both equally
seq = pipe = None
for _ in range(2):
    s = run("seq")
    p = run("pipe")
    seq = s if seq is None else min(seq, s)
    pipe = p if pipe is None else min(pipe, p)
    log(f"trial: seq {s * 1e3:.1f} ms/2-pass, pipelined {p * 1e3:.1f}")

log(f"BEST: sequential {seq * 1e3:.1f} ms per start+end pair "
    f"({seq / 2 * 1e3:.1f} ms/pass); pipelined {pipe * 1e3:.1f} "
    f"({pipe / 2 * 1e3:.1f} ms/pass) -> {(seq - pipe) * 1e3:.1f} ms hidden "
    f"({(1 - pipe / seq) * 100:.0f}%)")
