"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (mirrors the
reference's force-CPU CI strategy, tests/conftest.py:63-66)."""

import os

# NOTE: this image pins JAX_PLATFORMS=axon via sitecustomize, so env vars
# alone don't force CPU — the config update below is what actually works.
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'
# node subprocesses spawned by the CLI honor this (see sup3r_tpu/cli.py)
os.environ['SUP3R_TPU_PLATFORM'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def reseed_rng():
    """Reset the global seeded RNG before each test (reference:
    tests/conftest.py:56-60)."""
    import sup3r_tpu.utilities.utilities as uu

    uu.RANDOM_GENERATOR.bit_generator.state = np.random.default_rng(
        seed=42).bit_generator.state
