from approx_counter_tpu.dist.mesh import (  # noqa: F401
    approx_counts_sharded,
    data_mesh,
    shard_windows,
)
