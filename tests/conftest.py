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


@pytest.fixture(scope='session', autouse=True)
def _exo_cache_tmp(tmp_path_factory):
    """Point the default exo cache at a session tmp dir so tests that
    don't pass cache_dir never write into the repo CWD (round-3 review
    finding: a stray exo_cache/*.npy got committed)."""
    d = tmp_path_factory.mktemp('exo_cache')
    os.environ['SUP3R_TPU_EXO_CACHE_DIR'] = str(d)
    yield
    os.environ.pop('SUP3R_TPU_EXO_CACHE_DIR', None)


def _repo_untracked():
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        out = subprocess.run(
            ['git', '-C', root, 'status', '--porcelain'],
            capture_output=True, text=True, timeout=30)
    except Exception:  # pragma: no cover - git unavailable
        return None
    if out.returncode != 0:  # pragma: no cover
        return None
    # ONLY untracked entries ('?? path'): the fixture guards against
    # tests CREATING files in the repo tree. Tracked-file
    # modifications are development activity — including them made
    # any edit concurrent with a test run a false teardown failure
    return {line for line in out.stdout.splitlines()
            if line.startswith('??')}


@pytest.fixture(scope='module', autouse=True)
def _repo_stays_clean(request):
    """Fail loudly if a test module leaves new files in the repo tree
    (cache leaks, stray outputs)."""
    before = _repo_untracked()
    yield
    if before is None:
        return
    after = _repo_untracked()
    if after is None:
        return
    leaked = after - before
    assert not leaked, (
        f'test module {request.module.__name__} left files in the repo '
        f'tree: {sorted(leaked)}')


@pytest.fixture(autouse=True)
def reseed_rng():
    """Reset the global seeded RNG before each test (reference:
    tests/conftest.py:56-60)."""
    import sup3r_tpu.utilities.utilities as uu

    uu.RANDOM_GENERATOR.bit_generator.state = np.random.default_rng(
        seed=42).bit_generator.state
