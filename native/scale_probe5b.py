"""Round-5 stretch companions to scale_probe5.py: sort/selection and
per-stage attribution at W in {40960, 409600} (results in BASELINE.md
round-5 scaling rows).  Run each as its own process (one claim each):
  python native/scale_probe5b.py sort   > /tmp/sort35.log 2>&1
  python native/scale_probe5b.py stages > /tmp/attr35.log 2>&1
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
MODE = sys.argv[1] if len(sys.argv) > 1 else "stages"
if MODE == "sort":
    from bench import log, setup_cache, time_chained
    setup_cache()
    import jax, jax.numpy as jnp, numpy as np
    rng = np.random.default_rng(3)
    for P in (3522560, 8806400, 35225600):
        xs = [jax.device_put(rng.integers(0, 1<<32, P, dtype=np.uint64).astype(np.uint32)) for _ in range(4)]
        jax.block_until_ready(xs)
        @jax.jit
        def f(x):
            (s,) = jax.lax.sort([x], num_keys=1, is_stable=False)
            return s[:64]
        dt = time_chained(lambda i: f(xs[i % 3]), 3)
        log(f"P={P}: flat 1-key sort {dt*1e3:.2f} ms ({P/dt/1e6:.0f} M elem/s)")
        # rowsort selection at this P
        R = 512
        while R > 1 and (P % R or P // R < 512):
            R //= 2
        C = P // R
        ys = [jax.device_put(rng.integers(0, 1<<32, P, dtype=np.uint64).astype(np.uint32)) for _ in range(4)]
        @jax.jit
        def g(x, y):
            r1, r4 = jax.lax.sort([x.reshape(R, C), y.reshape(R, C)], dimension=1, num_keys=2, is_stable=False)
            f1, f4 = jax.lax.sort([r1[:, :512].reshape(-1), r4[:, :512].reshape(-1)], num_keys=2, is_stable=False)
            return f1[:64] + f4[:64]
        dt = time_chained(lambda i: g(xs[i % 3], ys[i % 3]), 3)
        log(f"P={P}: rowsort selection R={R} {dt*1e3:.2f} ms")
    log("done")
else:
    from bench import log, setup_cache, time_chained
    setup_cache()
    import jax, jax.numpy as jnp, numpy as np
    from approx_counter_tpu.core.complexity import lc_sum_threshold
    from approx_counter_tpu.count.exact import exact_count_select_rows
    from approx_counter_tpu.kernels.bpm import approx_counts, build_peq
    from approx_counter_tpu.core.codec import pack_windows_sparse, unpack_windows_sparse_t_jnp
    
    M, K = 101, 16
    rng = np.random.default_rng(23)
    for W in (40960, 409600):
        iters = 4 if W == 40960 else 3
        wts = [jax.device_put(jnp.asarray(rng.integers(0, 4, (M, W)).astype(np.uint8))) for _ in range(iters)]
        row_mask = jax.device_put(np.ones(W, bool))
        thr = jnp.int32(lc_sum_threshold(1.0, K)); z = jnp.zeros(0, jnp.uint32)
        jax.block_until_ready(wts)
        def stage(i):
            out = exact_count_select_rows(wts[i % iters], row_mask, K, thr, z, z,
                                          jnp.int32(500), jnp.int32(0), cap=512,
                                          n_forbidden=0, use_solid=False, transposed=True)
            return out["sel_lo"] + out["sel_count"]
        dt = time_chained(stage, iters)
        log(f"W={W}: exact stage {dt*1e3:.2f} ms ({W*(M-K+1)/dt/1e6:.0f} M pos/s)")
        codes = rng.integers(0, 1 << 32, 512, dtype=np.uint64)
        peq = build_peq(jnp.zeros(512, jnp.uint32), jnp.asarray(codes.astype(np.uint32)), K)
        def kern(i):
            return approx_counts(peq, wts[i % iters], row_mask, K, use_pallas=True)
        dt = time_chained(kern, iters)
        log(f"W={W}: kernel {dt*1e3:.2f} ms ({512*W/dt/1e9:.2f} Gpairs/s)")
        # unpack cost at this W
        sp = pack_windows_sparse(np.asarray(rng.integers(0,4,(W,M)).astype(np.uint8)), W-5)
        lo, n_idx, ncols, m = sp
        los = [jax.device_put(np.ascontiguousarray(lo)) for _ in range(iters)]
        ni = jax.device_put(n_idx)
        @jax.jit
        def unp(l):
            return unpack_windows_sparse_t_jnp(l, ni, jnp.int32(W-5), jnp.int32(ncols), m)[:, :64].sum(axis=1)
        dt = time_chained(lambda i: unp(los[i % iters]), iters)
        log(f"W={W}: sparse unpack_t {dt*1e3:.2f} ms")
    log("done")
