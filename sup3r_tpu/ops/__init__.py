"""Pure array math shared by the data plane and the models.

Every function here is written against the numpy API surface that
``jax.numpy`` also implements, dispatching on the input type: numpy in →
numpy out (host data plane), jax in → jax out (traceable under ``jit``).
"""

from sup3r_tpu.ops.coarsen import (  # noqa: F401
    smooth_data,
    spatial_coarsening,
    spatial_simple_enhancing,
    temporal_coarsening,
    temporal_simple_enhancing,
)
from sup3r_tpu.ops.interp import st_interp  # noqa: F401
from sup3r_tpu.ops.wind import invert_uv, transform_rotate_wind  # noqa: F401
