"""numpy / jax.numpy dispatch helper."""

import jax
import jax.numpy as jnp
import numpy as np


def array_module(*arrays):
    """Return ``jax.numpy`` if any input is a jax array or tracer, else
    ``numpy``. Lets one implementation serve the host data plane (numpy)
    and jitted device programs (jax)."""
    for a in arrays:
        if isinstance(a, (jax.Array, jax.core.Tracer)):
            return jnp
    return np
