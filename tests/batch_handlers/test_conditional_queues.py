"""Conditional-moment queue semantics for all six moment types, plus
SamplerDC weighted sampling (reference: tests/forward_pass/
test_conditional.py + tests batch_queues/samplers coverage)."""

import numpy as np
import pytest

from sup3r_tpu.models import Sup3rCondMom
from sup3r_tpu.ops import (
    spatial_simple_enhancing,
    temporal_simple_enhancing,
)
from sup3r_tpu.preprocessing.batch_handlers import (
    BatchHandlerMom1,
    BatchHandlerMom1SF,
    BatchHandlerMom2,
    BatchHandlerMom2Sep,
    BatchHandlerMom2SepSF,
    BatchHandlerMom2SF,
)
from sup3r_tpu.preprocessing.samplers import SamplerDC
from sup3r_tpu.utilities.test_helpers import make_fake_dset

FEATURES = ['u_100m', 'v_100m']


def _mom1_model():
    gen = {'hidden_layers': [
        {'class': 'Conv3D', 'filters': 8, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
        {'class': 'SpatioTemporalExpansion', 'spatial_mult': 2,
         'temporal_mult': 2, 'temporal_method': 'nearest'},
        {'class': 'Conv3D', 'filters': 2, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'}]}
    model = Sup3rCondMom(gen, learning_rate=1e-4)
    model.meta.update(lr_features=FEATURES, hr_out_features=FEATURES,
                      s_enhance=2, t_enhance=2,
                      input_resolution={'spatial': '12km',
                                        'temporal': '60min'})
    model.set_norm_stats({f: 0.0 for f in FEATURES},
                         {f: 1.0 for f in FEATURES})
    model.init_weights((1, 4, 4, 4, 2), (1, 8, 8, 8, 2))
    return model


def _make(handler_cls, **kwargs):
    data = make_fake_dset((16, 16, 48), FEATURES)
    return handler_cls([data], [], batch_size=2, n_batches=1,
                       s_enhance=2, t_enhance=2, sample_shape=(8, 8, 8),
                       queue_cap=1, **kwargs)


def _enhanced(lr, handler):
    out = spatial_simple_enhancing(lr, s_enhance=2)
    return temporal_simple_enhancing(out, t_enhance=2, mode='constant')


def test_mom1_target_is_hr():
    handler = _make(BatchHandlerMom1)
    batch = next(iter(handler))
    np.testing.assert_allclose(np.asarray(batch.output),
                               np.asarray(batch.high_res))
    assert batch.mask.shape == batch.high_res.shape
    assert np.all(np.asarray(batch.mask) == 1.0)  # no padding
    handler.stop()


def test_mom1_mask_padding():
    handler = _make(BatchHandlerMom1, s_padding=1, t_padding=1)
    batch = next(iter(handler))
    mask = np.asarray(batch.mask)
    assert np.all(mask[:, 0] == 0) and np.all(mask[:, -1] == 0)
    assert np.all(mask[:, :, 0] == 0) and np.all(mask[:, :, -1] == 0)
    assert np.all(mask[:, :, :, 0] == 0) and np.all(mask[:, :, :, -1]
                                                    == 0)
    assert np.all(mask[:, 1:-1, 1:-1, 1:-1] == 1)
    handler.stop()


def test_mom1sf_target_is_subfilter():
    handler = _make(BatchHandlerMom1SF)
    batch = next(iter(handler))
    expected = np.asarray(batch.high_res) - _enhanced(
        np.asarray(batch.low_res), handler)
    np.testing.assert_allclose(np.asarray(batch.output), expected,
                               rtol=1e-5, atol=1e-6)
    handler.stop()


def test_mom2_target_uses_lower_model():
    model = _mom1_model()
    handler = _make(BatchHandlerMom2, lower_models={1: model})
    batch = next(iter(handler))
    out = np.asarray(batch.output)
    assert out.shape == batch.high_res.shape
    assert (out >= 0).all()  # squared residual
    handler.stop()


def test_mom2sep_target_is_hr_squared():
    handler = _make(BatchHandlerMom2Sep)
    batch = next(iter(handler))
    np.testing.assert_allclose(np.asarray(batch.output),
                               np.asarray(batch.high_res) ** 2,
                               rtol=1e-5)
    handler.stop()


def test_mom2sf_target_nonneg():
    model = _mom1_model()
    handler = _make(BatchHandlerMom2SF, lower_models={1: model})
    batch = next(iter(handler))
    assert (np.asarray(batch.output) >= 0).all()
    handler.stop()


def test_mom2sepsf_target_is_subfilter_squared():
    handler = _make(BatchHandlerMom2SepSF)
    batch = next(iter(handler))
    sf = np.asarray(batch.high_res) - _enhanced(
        np.asarray(batch.low_res), handler)
    np.testing.assert_allclose(np.asarray(batch.output), sf ** 2,
                               rtol=1e-5, atol=1e-6)
    handler.stop()


def test_sampler_dc_weighted_bins():
    """All-weight-on-one-bin => every sample comes from that bin."""
    data = make_fake_dset((20, 20, 40), FEATURES)
    sampler = SamplerDC(data, sample_shape=(4, 4, 4),
                        spatial_weights=[0, 0, 0, 1],
                        temporal_weights=[0, 1])
    # spatial bins split the flattened row-major start-index range
    # with np.array_split (reference samplers/utilities.py:83): 20x20
    # grid, 4x4 samples -> 17x17=289 starts, bins [73,72,72,72];
    # bin 3 = flat >= 217 -> row >= 12
    for _ in range(20):
        s1, _, t, _ = sampler.get_sample_index()
        assert s1.start >= 12
        # temporal bins of 37 starts = [19, 18]; bin 1 -> start >= 19
        assert t.start >= 19
    sampler.update_weights([1, 0, 0, 0], [1, 0])
    for _ in range(20):
        s1, _, t, _ = sampler.get_sample_index()
        assert s1.start <= 4
        assert t.start <= 18


def test_sampler_dc_statistical_distribution():
    """Non-degenerate weights produce roughly matching empirical bin
    frequencies (reference: tests/batch_handlers/test_bh_dc.py
    test_counts)."""
    data = make_fake_dset((20, 20, 80), FEATURES)
    sampler = SamplerDC(data, sample_shape=(4, 4, 4),
                        spatial_weights=[0.75, 0.25, 0.0, 0.0],
                        temporal_weights=[0.0, 0.0, 0.5, 0.5])
    n = 400
    max_rows = 20 - 4 + 1
    flat_bins = np.zeros(4)
    t_bins = np.zeros(4)
    n_flat = max_rows * max_rows
    n_t_starts = 80 - 4 + 1
    for _ in range(n):
        s1, s2, t, _ = sampler.get_sample_index()
        flat = s1.start * max_rows + s2.start
        flat_bins[min(int(flat / (n_flat / 4)), 3)] += 1
        t_bins[min(int(t.start / (n_t_starts / 4)), 3)] += 1
    np.testing.assert_allclose(flat_bins / n, [0.75, 0.25, 0, 0],
                               atol=0.08)
    np.testing.assert_allclose(t_bins / n, [0, 0, 0.5, 0.5],
                               atol=0.08)
