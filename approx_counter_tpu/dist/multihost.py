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
    """
    sharding = NamedSharding(mesh, P(axis, None))
    return jax.make_array_from_process_local_data(sharding, local_windows)
