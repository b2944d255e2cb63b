"""HBM-aware auto device-batching (pipeline/memory.py): sizing from
the activation-memory model, the spatial-sharding fallback for
oversized chunks, and end-to-end equality with a fixed batch size.
TPU-first ergonomic replacing the reference's static node-sizing
guidance (reference: examples/sup3rcc/README.rst:37)."""

import numpy as np
import pytest

from sup3r_tpu.configs import get_config
from sup3r_tpu.models import Sup3rGan
from sup3r_tpu.pipeline import ForwardPass, ForwardPassStrategy
from sup3r_tpu.pipeline.memory import (
    estimate_activation_bytes,
    estimate_halo_bytes,
    resolve_device_batch_size,
)
from sup3r_tpu.utilities.test_helpers import make_fake_nc_file


def _flagship():
    model = Sup3rGan(get_config('spatiotemporal/gen_3x_4x_2f'),
                     get_config('spatiotemporal/disc_test'))
    model.init_weights((1, 12, 12, 12, 2), (1, 36, 36, 48, 2))
    return model


def test_estimates_scale_with_chunk():
    model = _flagship()
    small = estimate_activation_bytes(model, (12, 12, 12, 2))
    big = estimate_activation_bytes(model, (24, 24, 24, 2))
    assert big > 2.5 * small  # ~8x the voxels (params are constant)
    assert small > 1024 ** 2  # at least the params + activations


def test_spatial_model_5d_chunk_folds_time_into_batch():
    """Strategy planning always hands the padded (s1, s2, t, f) chunk
    shape to the estimator; a 4D spatial model folds time into the
    batch at dispatch (forward_pass._reshape_data_chunk), so the
    estimate must scale with t instead of silently reusing the input
    shape for every layer (which hid the 2->64 channel growth and
    undersized per-chunk bytes ~32x)."""
    model = Sup3rGan(get_config('spatial/gen_2x_2f'),
                     get_config('spatial/disc_test'))
    model.init_weights((1, 12, 12, 2), (1, 24, 24, 2))
    one = estimate_activation_bytes(model, (24, 24, 1, 2))
    many = estimate_activation_bytes(model, (24, 24, 16, 2))
    # activations scale 16x with t; params/overhead are constant
    assert many > 4 * one
    # and the per-slice estimate sees the channel growth: well above
    # the raw in+out footprint of a 2-feature slice
    assert one > 3 * (24 * 24 * 2 * 4 * (1 + 4))


def test_shape_inference_failure_is_loud():
    """A genuine shape-inference bug must surface at planning time,
    not degrade into a ~32x-undersized estimate and a device OOM
    after a 30-90 s remote compile (only NotImplementedError — the
    documented fused-layer case — falls back)."""
    model = _flagship()
    with pytest.raises(Exception) as err:
        # rank-2 lr shape: every conv's out_shape fails
        estimate_activation_bytes(model, (12, 2))
    assert not isinstance(err.value, NotImplementedError)


def test_resolution_default_hbm():
    """A (24, 24, 28) padded chunk fits many times into 16 GB."""
    model = _flagship()
    batch, use_spatial = resolve_device_batch_size(
        model, (24, 24, 28), 2)
    assert not use_spatial
    assert 2 <= batch <= 64


def test_resolution_tiny_hbm_falls_back_to_spatial():
    model = _flagship()
    batch, use_spatial = resolve_device_batch_size(
        model, (24, 24, 28), 2, hbm_bytes=16 * 1024 ** 2)
    assert use_spatial
    assert batch == 1


def test_halo_estimate_scales():
    model = _flagship()
    one = estimate_halo_bytes(model, (1, 24, 24, 28, 2), 1)
    two = estimate_halo_bytes(model, (1, 24, 24, 28, 2), 2)
    four = estimate_halo_bytes(model, (1, 24, 24, 28, 2), 4)
    assert one == 0
    assert four > two > 0


def _setup(tmp_path):
    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'),
                                   (12, 12, 8), ['u100', 'v100'])
    model = _flagship()
    model.meta.update(
        lr_features=['u_100m', 'v_100m'],
        hr_out_features=['u_100m', 'v_100m'],
        input_resolution={'spatial': '12km', 'temporal': '60min'})
    model.set_norm_stats({'u_100m': 0.0, 'v_100m': 0.0},
                         {'u_100m': 1.0, 'v_100m': 1.0})
    model_dir = str(tmp_path / 'model')
    model.save(model_dir)
    return input_file, model_dir


def _kwargs(input_file, model_dir):
    return dict(
        file_paths=input_file,
        model_kwargs={'model_dir': model_dir},
        model_class='Sup3rGan',
        fwp_chunk_shape=(6, 6, 4), spatial_pad=1, temporal_pad=1,
        out_pattern=None)


def test_auto_resolves_and_matches_fixed(tmp_path, monkeypatch):
    """device_batch_size='auto' resolves to an int >= 2 under the
    default budget and produces the same outputs as batch 2."""
    input_file, model_dir = _setup(tmp_path)
    s_auto = ForwardPassStrategy(**_kwargs(input_file, model_dir),
                                 device_batch_size='auto')
    out_auto = ForwardPass.run(s_auto, 0)
    assert isinstance(s_auto.device_batch_size, int)
    assert s_auto.device_batch_size >= 2
    assert not s_auto.use_mesh

    s_fixed = ForwardPassStrategy(**_kwargs(input_file, model_dir),
                                  device_batch_size=2)
    out_fixed = ForwardPass.run(s_fixed, 0)
    for k in out_fixed:
        np.testing.assert_allclose(out_auto[k], out_fixed[k],
                                   rtol=1e-5, atol=1e-5)


def test_auto_tiny_budget_switches_to_spatial(tmp_path, monkeypatch):
    """Faking a tiny HBM budget flips auto into use_mesh='spatial'
    and still produces correct outputs (matching the serial run)."""
    monkeypatch.setenv('SUP3R_TPU_HBM_GB', '0.02')
    input_file, model_dir = _setup(tmp_path)
    s_auto = ForwardPassStrategy(**_kwargs(input_file, model_dir),
                                 device_batch_size='auto')
    out_auto = ForwardPass.run(s_auto, 0)
    assert s_auto.device_batch_size == 1
    assert s_auto.use_mesh == 'spatial'

    monkeypatch.delenv('SUP3R_TPU_HBM_GB')
    s_serial = ForwardPassStrategy(**_kwargs(input_file, model_dir),
                                   device_batch_size=1)
    out_serial = ForwardPass.run(s_serial, 0)
    for k in out_serial:
        np.testing.assert_allclose(out_auto[k], out_serial[k],
                                   rtol=1e-4, atol=1e-4)
