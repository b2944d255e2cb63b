"""Device-mesh parallelism helpers."""

from sup3r_tpu.parallel.mesh import (  # noqa: F401
    get_mesh,
    replicate,
    shard_batch,
)
