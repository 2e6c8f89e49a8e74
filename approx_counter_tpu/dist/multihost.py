"""Multi-host orchestration (N >= 2 hosts, each with local TPU chips).

The reference is a single shared-memory process; this is the framework's
scale-out story (BASELINE.json configs 4-5): per-host FASTQ shards, a
global device mesh, and psum-merged counts over ICI within a slice / DCN
across hosts.

Flow (every host runs the same program, SPMD):

  1. ``initialize()``            -- jax.distributed handshake
  2. ``shard_paths(paths)``      -- round-robin input files to this host
  3. each host streams/reads its shard and samples ``sn // process_count``
     windows (reservoir over its shard; the union is a uniform sample of
     the union because shards are disjoint and rates are equal)
  4. ``global_windows(local)``   -- assemble a jax.Array whose shards are
     the per-host window batches (make_array_from_process_local_data)
  5. ``dist.mesh.make_full_step``-- the same jitted step as single-host:
     exact count via XLA's distributed sort, BPM via shard_map, counts
     psum-merged; selections/rankings replicated on every host
  6. host 0 exports.

Only step 1 needs real multi-host hardware; everything below it is the
mesh-shape-invariant code validated on virtual devices (tests/test_dist.py)
-- counting is order-independent, so the multi-host result equals the
single-host result on the same sampled windows.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """jax.distributed handshake; arguments default to env auto-detection
    (TPU pod metadata or JAX_COORDINATOR_ADDRESS et al.)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def shard_paths(
    paths: list[str],
    process_index: int | None = None,
    process_count: int | None = None,
) -> list[str]:
    """Deterministic round-robin assignment of input files to this host."""
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    return [p for i, p in enumerate(paths) if i % process_count == process_index]


def local_sample_quota(sn: int, process_count: int, process_index: int) -> int:
    """Split the global sample budget across hosts (remainder to low ranks)."""
    base = sn // process_count
    return base + (1 if process_index < sn % process_count else 0)


def global_windows(
    local_windows: np.ndarray, mesh: Mesh, axis: str = "data"
) -> jax.Array:
    """Assemble the global row-sharded window array from per-host batches.

    Every host passes its local [W_local, m] batch (same m, W_local equal
    across hosts -- pad with BASE_PAD rows + validity masking as usual);
    the result is a global [W_local * n_hosts, m] jax.Array sharded along
    ``axis``.

    The batch ships raw uint8 (not the single-chip sparse-N 2-bit
    format): on real multi-host deployments each host feeds its LOCAL
    chips over PCIe (GB/s -- ~1 ms for a default shard), so the packed
    formats' tunnel-latency savings don't apply, and
    make_array_from_process_local_data needs the final row layout.
    """
    sharding = NamedSharding(mesh, P(axis, None))
    return jax.make_array_from_process_local_data(sharding, local_windows)


def run_pipeline_multihost(prm, log=None) -> int:
    """SPMD multi-host driver: every host runs this same function.

    ``prm.input_file`` may be a comma-separated list of files; each host
    streams its round-robin shard, samples its quota of windows, and the
    jitted full step (dist.mesh.make_full_step) counts over the global
    mesh.  Host 0 exports.  With process_count == 1 this degrades to the
    single-host streaming pipeline (how it is tested here).
    """
    import jax.numpy as jnp

    from approx_counter_tpu.core.codec import join_code, split_code
    from approx_counter_tpu.core.complexity import lc_sum_threshold
    from approx_counter_tpu.dist.mesh import data_mesh, make_full_step
    from approx_counter_tpu.io.export import export_counter
    from approx_counter_tpu.io.kmer_list import parse_kmer_list
    from approx_counter_tpu.io.logging import Log, error
    from approx_counter_tpu.io.stream import stream_sample_windows

    log = log or Log()
    prm.validate()
    pc, pi = jax.process_count(), jax.process_index()
    is_host0 = pi == 0
    v = prm.v if is_host0 else 0
    mr_v = prm.mr_v if is_host0 else 0

    mesh = data_mesh()
    n_local_dev = len(jax.local_devices())
    wt = 512

    def round_up(x, mult):
        return ((x + mult - 1) // mult) * mult

    # equal local row counts across hosts (max quota, padded to tiles and
    # the local device count)
    quota = local_sample_quota(prm.sn, pc, pi)
    w_local = max(round_up(local_sample_quota(prm.sn, pc, 0), wt * n_local_dev),
                  wt * n_local_dev)

    if prm.forbid_kmer:
        forb = parse_kmer_list(prm.forbid_kmer)
    else:
        forb = np.empty(0, np.uint64)
    fhi, flo = split_code(forb)
    lc_thr = jnp.int32(lc_sum_threshold(prm.adjusted_lc, prm.k))

    paths = prm.input_file.split(",")
    my_paths = shard_paths(paths, pi, pc)

    # seed must differ per host or every host samples identically
    rng = np.random.default_rng(
        None if prm.seed is None else prm.seed + 1000003 * pi
    )

    cap = max(512, round_up(min(prm.limit, 1 << 20), 256))
    steps: dict[int, object] = {}  # cap -> jitted step (avoid retracing)

    def get_step(c):
        if c not in steps:
            steps[c] = make_full_step(
                mesh, prm.k, c, wt=wt,
                n_forbidden=len(forb), use_solid=prm.solid_km > 0,
                maxerr=prm.max_error,
            )
        return steps[c]

    for current_run in range(prm.nb_of_runs):
        run_suffix = f"_{current_run}"
        if mr_v > 0:
            log(f"[multihost {pi}/{pc}] streaming {len(my_paths)} file(s)")
        b_start, b_end, _ = stream_sample_windows(
            my_paths, quota, prm.sl, rng=rng, pad_rows_to=w_local
        )
        for which_end, batch in (("start", b_start), ("end", b_end)):
            wvalid_local = np.zeros(w_local, bool)
            wvalid_local[: batch.n_valid] = True
            gw = global_windows(batch.windows, mesh)
            gv = jax.make_array_from_process_local_data(
                NamedSharding(mesh, P("data")), wvalid_local
            )
            while True:
                step = get_step(cap)
                out = step(gw, gv, lc_thr, jnp.asarray(fhi),
                           jnp.asarray(flo), jnp.int32(prm.limit),
                           jnp.int32(prm.solid_km))
                n_keep = int(out["exact"]["n_keep"])
                if n_keep <= cap:
                    break
                cap = round_up(n_keep, 256)
            if is_host0:
                ex = out["exact"]
                if prm.exact_out:
                    codes = join_code(
                        np.asarray(ex["sel_hi"])[:n_keep],
                        np.asarray(ex["sel_lo"])[:n_keep],
                    )
                    path = prm.exact_out + run_suffix + "." + which_end
                    if not export_counter(
                        codes, np.asarray(ex["sel_count"])[:n_keep],
                        prm.k, path,
                    ):
                        error("Failed to export exact k-mer count")
                        return 1
                n_approx = min(
                    int(np.asarray(out["approx_valid"]).sum()), prm.limit
                )
                codes = join_code(
                    np.asarray(out["approx_hi"])[:n_approx],
                    np.asarray(out["approx_lo"])[:n_approx],
                )
                path = prm.output + run_suffix + "." + which_end
                if not export_counter(
                    codes, np.asarray(out["approx_count"])[:n_approx],
                    prm.k, path,
                ):
                    error("Failed to export approximate k-mer count")
                    return 1
            if prm.skip_end:
                break
    return 0
