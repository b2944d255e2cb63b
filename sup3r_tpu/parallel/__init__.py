"""Device-mesh parallelism helpers."""

from sup3r_tpu.parallel.mesh import (  # noqa: F401
    get_mesh,
    halo_bytes_from_compiled,
    init_multihost,
    replicate,
    shard_batch,
    shard_spatial,
)
