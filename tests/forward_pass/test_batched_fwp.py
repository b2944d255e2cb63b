"""Device-batched chunk execution must match per-chunk execution."""

import numpy as np

from sup3r_tpu.pipeline import ForwardPass, ForwardPassStrategy
from sup3r_tpu.utilities.test_helpers import make_fake_nc_file
from tests.forward_pass.test_forward_pass import (
    _save_model,
    _st_gen_config,
)


def test_device_batched_matches_serial(tmp_path):
    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'),
                                   (12, 12, 8), ['u100', 'v100'])
    model_dir, _ = _save_model(tmp_path, _st_gen_config(), 3, 4)
    kwargs = dict(
        file_paths=input_file,
        model_kwargs={'model_dir': model_dir},
        fwp_chunk_shape=(6, 6, 4),
        spatial_pad=1, temporal_pad=1,
        out_pattern=None)
    serial = ForwardPass.run(ForwardPassStrategy(**kwargs), 0)
    batched = ForwardPass.run(
        ForwardPassStrategy(**kwargs, device_batch_size=4), 0)
    assert set(serial) == set(batched)
    for idx in serial:
        np.testing.assert_allclose(batched[idx], serial[idx],
                                   atol=1e-4)


def test_mesh_sharded_chunk_batch(tmp_path):
    """use_mesh shards the chunk batch over all (8 virtual) devices
    and matches the unsharded result."""
    import jax

    assert jax.device_count() >= 8
    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'),
                                   (12, 12, 12), ['u100', 'v100'])
    model_dir, _ = _save_model(tmp_path, _st_gen_config(), 3, 4)
    kwargs = dict(
        file_paths=input_file,
        model_kwargs={'model_dir': model_dir},
        fwp_chunk_shape=(6, 6, 4),
        spatial_pad=1, temporal_pad=1,
        out_pattern=None)
    serial = ForwardPass.run(ForwardPassStrategy(**kwargs), 0)
    sharded = ForwardPass.run(
        ForwardPassStrategy(**kwargs, device_batch_size=16,
                            use_mesh=True), 0)
    assert set(serial) == set(sharded)
    for idx in serial:
        np.testing.assert_allclose(sharded[idx], serial[idx],
                                    atol=1e-4)
