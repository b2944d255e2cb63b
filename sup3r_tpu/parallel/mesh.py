"""Mesh construction and sharding helpers.

The framework's parallelism model (replacing the reference's
thread-per-GPU gradient summation and SLURM node fan-out, SURVEY §2.7):

  * training: batch sharded over a 1D ``data`` mesh axis; params
    replicated; XLA inserts the gradient all-reduce over ICI.
  * inference: independent spatiotemporal chunks batched over the same
    axis (chunks are embarrassingly parallel after halo padding).
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices=None, axis='data', devices=None):
    """A 1D device mesh over the first ``n_devices`` devices."""
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def shard_batch(mesh, *arrays, axis='data'):
    """Place arrays with their leading (batch/chunk) dim sharded over
    the mesh's data axis."""
    sharding = NamedSharding(mesh, P(axis))
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out[0] if len(out) == 1 else out


def replicate(mesh, tree):
    """Replicate a pytree (params / optimizer state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)
