"""Benchmark harness (driver contract: print ONE JSON line).

North-star metric (BASELINE.json): read-windows x candidate-k-mers scored
per second per chip at k=16, ed<=2 -- i.e. the production Pallas kernel
(candidate-bit-sliced level-NFA, kernels/bpm.py) on the default workload
shape (512 candidates x 40960 windows x 101-base windows; the reference's
defaults are 500 candidates x 40000 windows, approx_counter.cpp:708-710,
padded to tile multiples).

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
baseline is an optimized CPU stand-in for its hot loop -- the same Myers
BPM in C++ with OpenMP (native/cpu_baseline.cpp), compiled -O3
-march=native at bench time and measured on this host, scaled to the
reference's default 4 threads.  This is *favorable* to the reference: a
dense BPM sweep is typically faster per pair than SeqAn's FM-index
search-scheme enumeration it actually performs.

All diagnostics go to stderr; stdout carries exactly one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

C, W, M, K = 512, 40960, 101, 16
ITERS = 20
REF_THREADS = 4  # reference default, approx_counter.cpp:706


def log(msg: str) -> None:
    sys.stderr.write(f"[bench] {msg}\n")
    sys.stderr.flush()


def setup_cache() -> None:
    """Enable the persistent XLA compile cache (remote compiles are
    minutes-slow on this stack; repeat shapes become ~1s)."""
    import jax

    cache = os.path.expanduser("~/.cache/approx_counter_tpu/jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def time_chained(run, iters: int, trials: int = 3) -> float:
    """Honest per-call device timing on this remote-execution stack:
    ``run(i)`` must use a distinct input buffer per ``i`` (identical
    (executable, inputs) pairs can be served from a result cache), outputs
    are chained by addition so work cannot be elided, and a single
    device->host fetch is the completion fence (block_until_ready returns
    before remote execution finishes).  ``run(iters)`` warms compile on a
    spare buffer.  Returns best-of-``trials`` seconds per call."""
    import numpy as np

    t0 = time.perf_counter()
    np.asarray(run(iters))  # compile + claim on the spare buffer only
    log(f"first call (compile+claim): {time.perf_counter() - t0:.1f}s")
    best = None
    for _ in range(trials):
        t0 = time.perf_counter()
        acc = None
        for i in range(iters):
            o = run(i)
            acc = o if acc is None else acc + o
        np.asarray(acc)
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    return best


def bench_tpu() -> float:
    os.environ.setdefault("PYTHONPATH", "")
    import jax
    import jax.numpy as jnp
    import numpy as np

    setup_cache()

    from approx_counter_tpu.kernels.bpm import (
        approx_counts,
        build_peq,
    )

    backend = jax.default_backend()
    log(f"backend={backend} devices={jax.devices()}")

    rng = np.random.default_rng(12345)
    codes = rng.integers(0, 1 << (2 * K), C, dtype=np.uint64)
    hi = (codes >> np.uint64(32)).astype(np.uint32)
    lo = (codes & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    peq = jax.device_put(build_peq(hi, lo, K))
    # Distinct window buffers per iteration: identical (executable, inputs)
    # pairs can be served from a result cache by the runtime, which would
    # fake a ~17x speedup (observed on the axon stack).
    NBUF = ITERS + 1
    wts = [
        jax.device_put(
            jnp.asarray(rng.integers(0, 4, (W, M)).astype(np.uint8).T)
        )
        for _ in range(NBUF)
    ]
    wv = jax.device_put(jnp.ones(W, bool))

    use_pallas = backend not in ("cpu",)

    def run(i):
        win = wts[i % NBUF]
        # ct/wt=None -> the production dispatch (sliced NFA, tuned tiles)
        return approx_counts(peq, win, wv, K, use_pallas=use_pallas)

    dt = time_chained(run, ITERS)
    pairs_per_s = C * W / dt
    log(
        f"kernel: {dt * 1e3:.2f} ms/iter, {pairs_per_s / 1e9:.2f} Gpairs/s, "
        f"{C * W * M / dt / 1e12:.3f} Tcell/s"
    )

    # Secondary diagnostic (stderr only): one full counting pass -- exact
    # count + selection + BPM + re-rank as the pipeline's fused jit step.
    try:
        from approx_counter_tpu.params import Params
        from approx_counter_tpu.pipeline import Engine

        eng = Engine(Params(input_file="bench", sn=W, sl=M - 1, k=K),
                     use_pallas=use_pallas)
        wbufs = [
            rng.integers(0, 4, (W, M)).astype(np.uint8) for _ in range(16)
        ]
        # production path: host 2-bit sparse-N pack -> 0.25 B/base H2D ->
        # ONE fused dispatch (unpack + exact + BPM + rank) -> fetch
        eng.start_pass(wbufs[0], W - 5).finish()  # warm sparse executable
        t0 = time.perf_counter()
        for i in range(1, 4):  # distinct buffers; includes H2D + fetch
            eng.start_pass(wbufs[i], W - 5).finish()
        log(f"full pass (fused exact+BPM+rank, sparse-N 2-bit H2D): "
            f"{(time.perf_counter() - t0) / 3 * 1e3:.1f} ms")
        # dense two-plane alternate (the >4096-N fallback path); same
        # n_valid as the sparse arm so the A/B isolates the format
        jax.block_until_ready(
            eng._fused_step(wbufs[13], np.int32(W - 5), 512)
        )
        t0 = time.perf_counter()
        for i in range(14, 16):
            jax.device_get(eng._fused_step(wbufs[i], np.int32(W - 5), 512))
        log(f"full pass (dense two-plane fallback): "
            f"{(time.perf_counter() - t0) / 2 * 1e3:.1f} ms")
        # A/B the window transfer itself: raw uint8 vs packed planes
        from approx_counter_tpu.core.codec import pack_windows_host

        t0 = time.perf_counter()
        for i in range(4, 7):
            jax.block_until_ready(jax.device_put(wbufs[i]))
        log(f"window H2D raw uint8 ({wbufs[0].nbytes / 1e6:.1f} MB): "
            f"{(time.perf_counter() - t0) / 3 * 1e3:.1f} ms")
        packed = [pack_windows_host(wbufs[i]) for i in range(4, 7)]
        t0 = time.perf_counter()
        for planes, _ in packed:
            jax.block_until_ready(jax.device_put(planes))
        log(f"window H2D packed planes "
            f"({packed[0][0].nbytes / 1e6:.1f} MB, one buffer): "
            f"{(time.perf_counter() - t0) / 3 * 1e3:.1f} ms")
        t0 = time.perf_counter()
        for i in range(4, 7):
            pack_windows_host(wbufs[i])
        log(f"host-side pack cost (dense numpy): "
            f"{(time.perf_counter() - t0) / 3 * 1e3:.1f} ms")
        from approx_counter_tpu.core.codec import pack_windows_sparse

        t0 = time.perf_counter()
        for i in range(4, 7):
            pack_windows_sparse(wbufs[i], W - 5)
        log(f"host-side pack cost (sparse, native when built): "
            f"{(time.perf_counter() - t0) / 3 * 1e3:.1f} ms")
        # pipelined start+end pair (the CLI's two-pass flow): the second
        # pass's pack + H2D + dispatch overlap the first pass's compute
        t0 = time.perf_counter()
        for i in (7, 9, 11):  # fresh buffers: result cache would lie
            p1 = eng.start_pass(wbufs[i], W - 5)
            p2 = eng.start_pass(wbufs[i + 1], W - 5, prefetch=True)
            p1.finish()
            p2.finish()
        log(f"pipelined start+end pair: "
            f"{(time.perf_counter() - t0) / 3 * 1e3:.1f} ms/pair")
        # device-resident chained full pass: the pure device compute of
        # the whole fused pass (everything above it is the tunnel's
        # transfer/issue wall -- BASELINE.md round-4 decomposition)
        from approx_counter_tpu.core.codec import pack_windows_sparse

        fused = eng._fused_fn(512, M, "sparse")
        devbufs = []
        for i in range(7):  # 7th is the warm-call spare (time_chained)
            lo, n_idx, ncols, _ = pack_windows_sparse(wbufs[i], W - 5)
            n_idx_ext = np.empty(len(n_idx) + 2, np.int32)
            n_idx_ext[:-2] = n_idx
            n_idx_ext[-2] = W - 5
            n_idx_ext[-1] = ncols
            devbufs.append((jax.device_put(lo), jax.device_put(n_idx_ext)))
        jax.block_until_ready([d[0] for d in devbufs])
        tail = eng._tail_dev()
        dt = time_chained(
            lambda i: fused(*devbufs[i % len(devbufs)], *tail), 6
        )
        log(f"full pass device compute (chained, device-resident): "
            f"{dt * 1e3:.2f} ms")
        # device window pool (round 5): the -mr multi-pass steady state --
        # per-pass H2D is a ~160 KB chosen-id vector instead of the plane
        from approx_counter_tpu.io.fastx import Reads

        n_reads, read_len = 50000, 2 * M
        pbuf = rng.integers(0, 4, n_reads * read_len).astype(np.uint8)
        poffs = np.arange(n_reads + 1, dtype=np.int64) * read_len
        eng.build_pool(Reads(buf=pbuf, offsets=poffs), M - 1)
        chos = [rng.permutation(n_reads)[:W] for _ in range(9)]
        eng.start_pass_pool(chos[8], W, end=False).finish()  # warm
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            pends = [eng.start_pass_pool(chos[i], W, end=bool(i % 2),
                                         prefetch=True) for i in range(8)]
            for p in pends:
                p.finish()
            cur = (time.perf_counter() - t0) / 8
            best = cur if best is None else min(best, cur)
        log(f"device-pool -mr steady state: {best * 1e3:.1f} ms/pass")
    except Exception as e:  # noqa: BLE001
        log(f"full-pass diagnostic unavailable: {e}")
    return pairs_per_s


def bench_cpu_baseline() -> float | None:
    """Compile + run the C++ OpenMP BPM baseline; returns pairs/s at the
    reference's 4 threads (scaled from this host's core count if lower)."""
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "native", "cpu_baseline.cpp")
    exe = "/tmp/cpu_baseline"
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fopenmp", "-std=c++14",
             "-o", exe, src],
            check=True, capture_output=True, timeout=120,
        )
        ncpu = os.cpu_count() or 1
        threads = min(REF_THREADS, ncpu)
        # subsample W to keep the CPU run short; pairs/s is size-independent
        sub_w = 4096
        # best-of-2: this host's memory bandwidth intermittently throttles
        # ~100x (CLAUDE.md), and a throttled denominator silently inflates
        # vs_baseline (r5 saw 1658x vs the healthy ~744x from this alone)
        per_s, info = 0.0, ""
        for _ in range(2):
            r = subprocess.run(
                [exe, str(C), str(sub_w), str(M), str(K), str(threads)],
                check=True, capture_output=True, timeout=600, text=True,
            )
            if float(r.stdout.strip()) > per_s:
                per_s, info = float(r.stdout.strip()), r.stderr.strip()
        log(f"cpu baseline ({threads} thr, best of 2): "
            f"{per_s / 1e6:.2f} Mpairs/s [{info}]")
        if threads < REF_THREADS:
            per_s *= REF_THREADS / threads  # optimistic linear scaling
            log(f"scaled to {REF_THREADS} thr: {per_s / 1e6:.2f} Mpairs/s")
        return per_s
    except Exception as e:  # noqa: BLE001
        log(f"cpu baseline unavailable: {e}")
        return None


def main() -> None:
    tpu = bench_tpu()
    base = bench_cpu_baseline()
    vs = tpu / base if base else None
    print(
        json.dumps(
            {
                "metric": "window-candidate pairs scored/sec/chip "
                          "(k=16, ed<=2, m=101)",
                "value": round(tpu, 1),
                "unit": "pairs/s",
                "vs_baseline": round(vs, 1) if vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
