"""Real-chip differential smoke for the production (sliced) kernel across
the full k / maxerr envelope -- interpret-mode tests can't catch Mosaic
lowering issues, so this runs the dispatch path on hardware and checks it
against the jnp Myers scan (independent algorithm) on the same device.
One process = one chip claim; all configs batched.
Usage: python native/tpu_smoke.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import log, setup_cache  # noqa: E402

import jax  # noqa: E402

setup_cache()

from approx_counter_tpu.kernels.bpm import (  # noqa: E402
    approx_counts,
    approx_counts_jnp,
    build_peq,
)

assert jax.default_backend() not in ("cpu",), "needs the TPU"

rng = np.random.default_rng(99)
C, W, m = 64, 512, 40
fails = 0
for k in (2, 3, 4, 8, 12, 16, 17, 24, 31, 32):
    for maxerr in (0, 2, 3):
        codes = rng.integers(0, 1 << min(2 * k, 63), C, dtype=np.uint64)
        hi = (codes >> np.uint64(32)).astype(np.uint32)
        lo = (codes & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        peq = build_peq(hi, lo, k)
        wins = rng.integers(0, 6, (m, W)).astype(np.uint8)  # incl. N + pad
        valid = np.ones(W, bool)
        valid[-17:] = False
        want = np.asarray(approx_counts_jnp(peq, wins, valid, k,
                                            maxerr=maxerr))
        got = np.asarray(approx_counts(peq, wins, valid, k, maxerr=maxerr,
                                       use_pallas=True))
        ok = (want == got).all()
        fails += 0 if ok else 1
        log(f"k={k:2d} maxerr={maxerr}: "
            + ("OK" if ok else f"FAIL {want[:5]} vs {got[:5]}"))
print("SMOKE " + ("PASS" if fails == 0 else f"FAIL ({fails})"))
sys.exit(1 if fails else 0)
