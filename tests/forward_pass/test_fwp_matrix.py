"""Forward-pass padding / chunk-shape matrix (mirrors reference
tests/forward_pass/test_forward_pass.py sweeps): chunk shapes that
don't divide the domain, spatial+temporal pad combinations (exact
stitching with receptive-field-1 models), pad-width guardrails, and
time-slice subsets."""

import numpy as np
import pytest

from sup3r_tpu.pipeline import ForwardPass, ForwardPassStrategy
from sup3r_tpu.utilities.test_helpers import make_fake_nc_file
from tests.forward_pass.test_forward_pass import (
    _pointwise_gen_config,
    _save_model,
)

FEATURES = ['u_100m', 'v_100m']


def _full_domain_truth(model, strategy):
    """Run the whole domain through the model in one pass."""
    data = np.asarray(strategy.input_handler.data.data)
    lr = np.transpose(data, (0, 1, 2, 3))[None]  # (1, s1, s2, t, f)
    return model.generate(lr)[0]


@pytest.mark.parametrize(('chunk', 'pads'), [
    ((4, 4, 4), (0, 0)),
    ((4, 4, 4), (2, 1)),
    ((6, 6, 4), (1, 2)),   # non-divisible chunk shapes
    ((10, 10, 10), (3, 3)),  # single chunk w/ pads clipped to domain
    ((3, 10, 2), (0, 2)),
])
def test_chunked_equals_full_domain(tmp_path, chunk, pads):
    """For a receptive-field-1 generator, chunked output is EXACTLY
    the full-domain output for every chunk/pad combination."""
    input_file = make_fake_nc_file(str(tmp_path / 'in.nc'),
                                   (10, 10, 10), ['u100', 'v100'])
    model_dir, model = _save_model(tmp_path, _pointwise_gen_config(),
                                   3, 4, is_5d=True)
    spatial_pad, temporal_pad = pads
    strategy = ForwardPassStrategy(
        file_paths=input_file, model_class='Sup3rGan',
        model_kwargs={'model_dir': model_dir},
        fwp_chunk_shape=chunk, spatial_pad=spatial_pad,
        temporal_pad=temporal_pad, out_pattern=None)
    truth = _full_domain_truth(model, strategy)
    outputs = {}
    for node in range(len(strategy.node_chunks)):
        outputs.update(ForwardPass.run(strategy, node) or {})
    assert len(outputs) == strategy.fwp_slicer.n_chunks
    # every chunk matches its window of the full-domain output, and
    # together they tile the whole grid
    got = np.full(truth.shape, np.nan, dtype=np.float32)
    slicer = strategy.fwp_slicer
    for idx, arr in outputs.items():
        s_idx, _ = slicer.get_chunk_indices(idx)
        hr_s1, hr_s2 = slicer.s_hr_slices[s_idx]
        t_hr = _t_slice(strategy, idx)
        np.testing.assert_allclose(
            arr, truth[hr_s1, hr_s2, t_hr], atol=1e-5)
        got[hr_s1, hr_s2, t_hr] = arr
    assert not np.isnan(got).any()


def _t_slice(strategy, idx):
    """HR time slice of chunk ``idx`` in the full-domain output."""
    s = strategy.fwp_slicer
    _, t_idx = s.get_chunk_indices(idx)
    lr = s.t_lr_slices[t_idx]
    t_enh = strategy.t_enhance
    return slice(lr.start * t_enh, lr.stop * t_enh)


def test_time_slice_subset(tmp_path):
    """A strategy over a time_slice subset only enhances that window."""
    input_file = make_fake_nc_file(str(tmp_path / 'in.nc'),
                                   (8, 8, 12), ['u100', 'v100'])
    model_dir, model = _save_model(tmp_path, _pointwise_gen_config(),
                                   3, 4, is_5d=True)
    strategy = ForwardPassStrategy(
        file_paths=input_file, model_class='Sup3rGan',
        model_kwargs={'model_dir': model_dir},
        fwp_chunk_shape=(8, 8, 12), spatial_pad=0, temporal_pad=0,
        input_handler_kwargs={'time_slice': slice(4, 8)},
        out_pattern=None)
    out = ForwardPass.run(strategy, 0)
    arr = next(iter(out.values())) if isinstance(out, dict) else out[0]
    assert arr.shape == (24, 24, 16, 2)


def test_pad_wider_than_domain(tmp_path):
    """Pads bigger than the domain get clipped, not crash."""
    input_file = make_fake_nc_file(str(tmp_path / 'in.nc'),
                                   (6, 6, 4), ['u100', 'v100'])
    model_dir, model = _save_model(tmp_path, _pointwise_gen_config(),
                                   3, 4, is_5d=True)
    strategy = ForwardPassStrategy(
        file_paths=input_file, model_class='Sup3rGan',
        model_kwargs={'model_dir': model_dir},
        fwp_chunk_shape=(6, 6, 4), spatial_pad=10, temporal_pad=10,
        out_pattern=None)
    out = ForwardPass.run(strategy, 0)
    arr = next(iter(out.values())) if isinstance(out, dict) else out[0]
    assert arr.shape == (18, 18, 16, 2)
    assert np.isfinite(arr).all()
