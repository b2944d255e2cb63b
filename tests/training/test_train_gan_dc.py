"""Data-centric GAN training sweep over spatial/temporal bin layouts
(mirrors reference tests/training/test_train_gan_dc.py:22-160):
adaptive bin weights track validation losses, stay normalized, and
spatial vs spatiotemporal DC models both train end-to-end."""

import numpy as np
import pytest

from sup3r_tpu.models import Sup3rGanDC
from sup3r_tpu.preprocessing.batch_handlers import BatchHandlerDC
from sup3r_tpu.utilities.test_helpers import make_fake_dset

FEATURES = ['u_100m', 'v_100m']


def _gen(st, mult=2):
    conv = 'Conv3D' if st else 'Conv2D'
    expand = ({'class': 'SpatioTemporalExpansion', 'spatial_mult': mult,
               'temporal_mult': 2, 'temporal_method': 'nearest'}
              if st else
              {'class': 'SpatialExpansion', 'spatial_mult': mult})
    return [
        {'class': conv, 'filters': 8 * mult * mult, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
        expand,
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': conv, 'filters': len(FEATURES), 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
    ]


def _disc(st):
    return [
        {'class': 'Conv3D' if st else 'Conv2D', 'filters': 8,
         'kernel_size': 3, 'strides': 2, 'padding': 'same'},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'Flatten'}, {'class': 'Dense', 'units': 1},
    ]


@pytest.mark.parametrize(('n_space_bins', 'n_time_bins', 'st'), [
    (4, 1, False),
    (1, 4, True),
    (4, 4, True),
    (2, 2, True),
])
def test_train_gan_dc_bins(n_space_bins, n_time_bins, st):
    """DC training adapts the sampling weights per bin from the
    validation losses and keeps them a probability vector."""
    t_enhance = 2 if st else 1
    sample_shape = (8, 8, 4) if st else (8, 8, 1)
    handler = BatchHandlerDC(
        [make_fake_dset((20, 20, 60), FEATURES)],
        [make_fake_dset((20, 20, 60), FEATURES)],
        batch_size=2, n_batches=2, s_enhance=2, t_enhance=t_enhance,
        sample_shape=sample_shape, n_space_bins=n_space_bins,
        n_time_bins=n_time_bins)
    assert len(handler.spatial_weights) == n_space_bins
    assert len(handler.temporal_weights) == n_time_bins

    model = Sup3rGanDC(_gen(st), _disc(st), learning_rate=5e-3)
    model.train(handler, input_resolution={'spatial': '30km',
                                           'temporal': '60min'},
                n_epoch=2, out_dir=None)
    assert len(model.history) == 2
    np.testing.assert_allclose(np.sum(handler.spatial_weights), 1.0,
                               rtol=1e-5)
    np.testing.assert_allclose(np.sum(handler.temporal_weights), 1.0,
                               rtol=1e-5)
    assert (np.asarray(handler.spatial_weights) >= 0).all()
    assert (np.asarray(handler.temporal_weights) >= 0).all()
    # with >1 bin, adaptive weighting must actually move off uniform
    if n_space_bins > 1:
        assert not np.allclose(handler.spatial_weights,
                               1.0 / n_space_bins)
    if n_time_bins > 1:
        assert not np.allclose(handler.temporal_weights,
                               1.0 / n_time_bins)
    handler.stop()


def test_dc_bin_losses_recorded():
    """Per-bin validation losses appear in the history so the weight
    update is auditable (reference: models/dc.py calc_bin_losses)."""
    handler = BatchHandlerDC(
        [make_fake_dset((16, 16, 48), FEATURES)],
        [make_fake_dset((16, 16, 48), FEATURES)],
        batch_size=1, n_batches=2, s_enhance=2, t_enhance=1,
        sample_shape=(8, 8, 1), n_space_bins=2, n_time_bins=1)
    model = Sup3rGanDC(_gen(False), _disc(False), learning_rate=5e-3)
    model.train(handler, input_resolution={'spatial': '30km',
                                           'temporal': '60min'},
                n_epoch=1, out_dir=None)
    assert 'val_loss_gen' in model.history
    assert np.isfinite(model.history['val_loss_gen']).all()
    handler.stop()


@pytest.mark.parametrize('CustomLayer', ['Sup3rAdder', 'Sup3rConcat'])
def test_train_gan_dc_with_hi_res_topo(CustomLayer):
    """Data-centric training with hi-res topography injected
    mid-network (mirrors reference tests/training/test_train_exo_dc.py
    test_wind_dc_hi_res_topo): the DC bin machinery and the exo-layer
    machinery compose, the exo channel stays out of hr_out_features,
    and generate() requires the exo input afterwards."""
    features = ['u_100m', 'v_100m', 'topography']
    gen = [
        {'class': 'Conv3D', 'filters': 16, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
        {'class': 'SpatioTemporalExpansion', 'spatial_mult': 2},
        {'class': 'Activation', 'activation': 'relu'},
        {'class': CustomLayer, 'name': 'topography'},
        {'class': 'Conv3D', 'filters': 2, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
    ]
    handler = BatchHandlerDC(
        [make_fake_dset((20, 20, 48), features)],
        [make_fake_dset((20, 20, 48), features)],
        batch_size=2, n_batches=2, s_enhance=2, t_enhance=1,
        sample_shape=(10, 10, 4), n_space_bins=4, n_time_bins=4,
        feature_sets={'hr_exo_features': ['topography']})
    model = Sup3rGanDC(gen, _disc(True), learning_rate=1e-4)
    model.train(handler, input_resolution={'spatial': '16km',
                                           'temporal': '3600min'},
                n_epoch=1, weight_gen_advers=0.0, train_gen=True,
                train_disc=False, out_dir=None)
    handler.stop()
    assert model.meta['hr_out_features'] == ['u_100m', 'v_100m']
    assert model.meta['class'] == 'Sup3rGanDC'
    assert 'topography' in handler.hr_exo_features
    assert 'topography' not in model.hr_out_features

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 12, 12, 4, 3)).astype(np.float32)
    topo = rng.uniform(0, 1, (1, 24, 24, 4, 1)).astype(np.float32)
    with pytest.raises((RuntimeError, KeyError, ValueError)):
        model.generate(x, exogenous_data=None)
    y = model.generate(x, exogenous_data={'topography': topo})
    assert y.dtype == np.float32
    assert y.shape == (1, 24, 24, 4, 2)


def test_dc_bins_conflict_with_sample_shape():
    """Requesting more bins than distinct sample starts must fail
    loudly at construction (reference test_train_exo_dc.py asserts
    the conflicting layout raises)."""
    features = ['u_100m', 'v_100m', 'topography']
    with pytest.raises((AssertionError, ValueError)):
        BatchHandlerDC(
            [make_fake_dset((20, 20, 48), features)],
            [make_fake_dset((20, 20, 48), features)],
            batch_size=2, n_batches=1, s_enhance=2, t_enhance=1,
            sample_shape=(20, 20, 8), n_space_bins=4, n_time_bins=4,
            feature_sets={'hr_exo_features': ['topography']})
