"""Data-parallel distribution over a device mesh.

This component has no counterpart in the reference -- its only parallelism
is OpenMP threads inside ``errorCount``
(/root/reference/approx_counter.cpp:547-599) with an ``omp critical``
reduction.  The TPU-native design (SURVEY.md §2 parallelism audit):

  * sampled read **windows are sharded** along a 1-D ``data`` mesh axis;
  * **candidate k-mers are replicated** (the Peq table is a few KB);
  * each device scores its window shard with the Pallas BPM kernel and the
    per-candidate partial counts merge with a ``psum`` allreduce -- riding
    ICI within a slice, DCN across hosts (via jax.distributed init);
  * the exact-count stage is a plain ``jit`` over globally-sharded window
    arrays: packing is embarrassingly parallel and the sort/RLE lowers to
    XLA's distributed sort, so no hand-written collective is needed.

Counting is order-independent and every per-window contribution is summed
exactly once, so results are invariant to mesh shape (asserted by
tests/test_dist.py, the determinism story replacing the reference's
thread-safety-by-construction).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(devices=None, axis: str = "data") -> Mesh:
    """1-D mesh over the given (default: all) devices."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis,))


def shard_windows(windows_t, window_valid, mesh: Mesh, axis: str = "data"):
    """Place a transposed window batch on the mesh in the layout the approx
    path consumes: ``windows_t`` is [m, W] with the *window* axis (last)
    sharded, ``window_valid`` is [W] sharded the same way.  Window counts
    are pre-padded to a multiple of the device count by the sampler's
    ``pad_to``."""
    ws = jax.device_put(windows_t, NamedSharding(mesh, P(None, axis)))
    vs = jax.device_put(window_valid, NamedSharding(mesh, P(axis)))
    return ws, vs


@functools.lru_cache(maxsize=None)
def _sharded_counts_fn(
    mesh: Mesh, axis: str, k: int, ct, wt, use_pallas: bool,
    interpret: bool, maxerr: int,
):
    """Build + jit the shard_map fan-out once per config.  Without the
    outer jit a bare shard_map call re-traces (and on the remote stack
    re-compiles) EVERY invocation -- measured 3 s/call vs 5.8 ms for the
    cached executable (native/shard_timing.py)."""
    from approx_counter_tpu.kernels.bpm import approx_counts

    def shard_fn(peq_rep, wt_shard, wv_shard):
        counts = approx_counts(
            peq_rep, wt_shard, wv_shard, k, maxerr=maxerr,
            use_pallas=use_pallas, ct=ct, wt=wt, interpret=interpret,
        )
        return jax.lax.psum(counts, axis)

    return jax.jit(jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(None, axis), P(axis)),
        out_specs=P(),
        # constant-initialized scan carries trip the varying-manual-axes
        # typecheck; correctness of the reduction is carried by the psum
        check_vma=False,
    ))


def approx_counts_sharded(
    peq,            # [C, 4] uint32, replicated
    windows_t,      # [m, W] uint8; W sharded
    window_valid,   # [W] bool; sharded
    k: int,
    mesh: Mesh,
    axis: str = "data",
    ct: int | None = None,
    wt: int | None = None,
    use_pallas: bool = True,
    interpret: bool = False,
    maxerr: int = 2,
):
    """shard_map fan-out of the BPM kernel + psum count merge -> [C] int32."""
    fn = _sharded_counts_fn(
        mesh, axis, k, ct, wt, use_pallas, interpret, maxerr
    )
    return fn(peq, windows_t, window_valid)


def make_approx_step(
    mesh: Mesh,
    k: int,
    axis: str = "data",
    ct: int | None = None,
    wt: int | None = None,
    use_pallas: bool | None = None,
    maxerr: int = 2,
):
    """Approx-only mesh step (the multihost ``--from-exact`` resume path):
    explicit candidate selection in, BPM counts + CompareCount re-rank
    out; no exact-count stage."""
    from approx_counter_tpu.count.approx import rank_with_zero_counts
    from approx_counter_tpu.kernels.bpm import build_peq

    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)

    @jax.jit
    def step(windows, window_valid, sel_hi, sel_lo, sel_valid):
        peq = build_peq(sel_hi, sel_lo, k)
        windows_t = jnp.transpose(windows, (1, 0))
        counts = approx_counts_sharded(
            peq, windows_t, window_valid, k, mesh=mesh, axis=axis,
            ct=ct, wt=wt, use_pallas=use_pallas, maxerr=maxerr,
        )
        a_hi, a_lo, a_cnt, a_val = rank_with_zero_counts(
            sel_hi, sel_lo, counts, sel_valid, k
        )
        return dict(approx_hi=a_hi, approx_lo=a_lo, approx_count=a_cnt,
                    approx_valid=a_val)

    return step


def make_full_step(
    mesh: Mesh,
    k: int,
    cap: int,
    axis: str = "data",
    ct: int | None = None,
    wt: int | None = None,
    use_pallas: bool | None = None,
    n_forbidden: int = 0,
    use_solid: bool = False,
    maxerr: int = 2,
):
    """Build the jitted full counting step over a mesh: window batch in,
    CompareCount-ranked exact + approximate counts out.

    This is the multi-chip "training step" analog: windows arrive sharded
    P(axis, None); the exact stage runs under XLA auto-SPMD; the approx
    stage fans out through shard_map + psum; selections/rankings are
    replicated.
    """
    from approx_counter_tpu.count.approx import rank_with_zero_counts
    from approx_counter_tpu.count.exact import exact_count_select
    from approx_counter_tpu.kernels.bpm import build_peq

    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)

    from approx_counter_tpu.count.exact import exact_count_select_rows

    @jax.jit
    def step(windows, window_valid, lc_sum_thr, fhi, flo, limit, solid_km):
        # window_valid: explicit [W] bool row mask -- multi-host layouts
        # interleave valid rows per host shard, so an iota < n_valid test
        # would be wrong there.
        out = exact_count_select_rows(
            windows, window_valid, k, lc_sum_thr, fhi, flo, limit, solid_km,
            cap=cap, n_forbidden=n_forbidden, use_solid=use_solid,
        )
        peq = build_peq(out["sel_hi"], out["sel_lo"], k)
        windows_t = jnp.transpose(windows, (1, 0))
        counts = approx_counts_sharded(
            peq, windows_t, window_valid, k, mesh=mesh, axis=axis,
            ct=min(ct, cap) if ct is not None else None,
            wt=wt, use_pallas=use_pallas, maxerr=maxerr,
        )
        a_hi, a_lo, a_cnt, a_val = rank_with_zero_counts(
            out["sel_hi"], out["sel_lo"], counts, out["sel_valid"], k
        )
        return dict(
            exact=out,
            approx_hi=a_hi,
            approx_lo=a_lo,
            approx_count=a_cnt,
            approx_valid=a_val,
        )

    return step
