"""Model family: LinearInterp, SurfaceSpatialMetModel, MultiStepGan,
Sup3rCondMom, Sup3rGanDC, SolarCC, Sup3rGanWithObs.

Mirrors reference tests/training/test_train_{solar,conditional,gan_dc}
and tests/forward_pass/test_multi_step.py coverage.
"""

import os

import numpy as np
import pytest

from sup3r_tpu.models import (
    LinearInterp,
    MultiStepGan,
    SolarCC,
    SolarMultiStepGan,
    Sup3rCondMom,
    Sup3rGan,
    Sup3rGanDC,
    Sup3rGanWithObs,
    SurfaceSpatialMetModel,
)
from sup3r_tpu.preprocessing.batch_handlers import (
    BatchHandler,
    BatchHandlerDC,
    BatchHandlerMom1,
    BatchHandlerMom1SF,
    BatchHandlerMom2,
)
from sup3r_tpu.utilities.test_helpers import make_fake_dset

RNG = np.random.default_rng(7)


def _small_gen_s(n_feats=2, mult=2, in_filters=8):
    return [
        {'class': 'Conv2D', 'filters': in_filters * mult * mult,
         'kernel_size': 3, 'strides': 1, 'padding': 'same'},
        {'class': 'SpatialExpansion', 'spatial_mult': mult},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'Conv2D', 'filters': n_feats, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
    ]


def _small_gen_st(n_feats=2, s_mult=2, t_mult=2):
    return [
        {'class': 'Conv3D', 'filters': 8 * s_mult * s_mult,
         'kernel_size': 3, 'strides': 1, 'padding': 'same'},
        {'class': 'SpatioTemporalExpansion', 'spatial_mult': s_mult,
         'temporal_mult': t_mult, 'temporal_method': 'nearest'},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'Conv3D', 'filters': n_feats, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
    ]


def _small_disc(is_5d=False):
    return [
        {'class': 'Conv3D' if is_5d else 'Conv2D', 'filters': 8,
         'kernel_size': 3, 'strides': 2, 'padding': 'same'},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'Flatten'}, {'class': 'Dense', 'units': 1},
    ]


def test_linear_interp(tmp_path):
    model = LinearInterp(['u_100m'], s_enhance=2, t_enhance=3)
    lr = RNG.random((2, 4, 4, 5, 1)).astype(np.float32)
    out = model.generate(lr)
    assert out.shape == (2, 8, 8, 15, 1)
    out_dir = str(tmp_path / 'linear')
    model.save(out_dir)
    loaded = LinearInterp.load(out_dir)
    assert loaded.s_enhance == 2 and loaded.t_enhance == 3
    np.testing.assert_allclose(loaded.generate(lr), out)


def test_surface_model(tmp_path):
    features = ['temperature_2m', 'relativehumidity_2m', 'pressure_0m']
    model = SurfaceSpatialMetModel(features, s_enhance=2)
    lr = np.stack([
        20 + 5 * RNG.random((3, 8, 8)),
        50 + 10 * RNG.random((3, 8, 8)),
        101000 + 100 * RNG.random((3, 8, 8)),
    ], axis=-1).astype(np.float32)
    lr_topo = (1000 * RNG.random((8, 8))).astype(np.float32)
    hr_topo = (1000 * RNG.random((16, 16))).astype(np.float32)
    exo = {'topography': {'steps': [{'data': lr_topo},
                                    {'data': hr_topo}]}}
    out = model.generate(lr, exogenous_data=exo)
    assert out.shape == (3, 16, 16, 3)
    # fix_bias keeps the re-coarsened output close to the input
    # (LANCZOS residual is non-zero but small; reference docstring:
    # only NEAREST enforces exactly-zero bias)
    from sup3r_tpu.ops import spatial_coarsening

    coarse = spatial_coarsening(out[..., 0:1], 2)[..., 0]
    resid = np.abs(coarse - lr[..., 0]).mean()
    model_nofix = SurfaceSpatialMetModel(features, s_enhance=2,
                                         fix_bias=False)
    out_nofix = model_nofix.generate(lr, exogenous_data=exo)
    coarse_nofix = spatial_coarsening(out_nofix[..., 0:1], 2)[..., 0]
    resid_nofix = np.abs(coarse_nofix - lr[..., 0]).mean()
    assert resid < resid_nofix
    assert resid < 0.5
    # save/load
    out_dir = str(tmp_path / 'surface')
    model.save(out_dir)
    loaded = SurfaceSpatialMetModel.load(out_dir)
    assert loaded._s_enhance == 2


def test_multi_step_gan(tmp_path):
    """Spatial 2x then spatiotemporal 2x/2x chained = 4x/2x total."""
    features = ['u_100m', 'v_100m']
    m1 = Sup3rGan(_small_gen_s(), _small_disc())
    m1.meta.update(lr_features=features, hr_out_features=features,
                   s_enhance=2, t_enhance=1)
    m1.set_norm_stats({f: 0.1 for f in features},
                      {f: 1.1 for f in features})
    m1.init_weights((1, 6, 6, 2), (1, 12, 12, 2))
    m2 = Sup3rGan(_small_gen_st(), _small_disc(True))
    m2.meta.update(lr_features=features, hr_out_features=features,
                   s_enhance=2, t_enhance=2)
    m2.set_norm_stats({f: 0.1 for f in features},
                      {f: 1.1 for f in features})
    m2.init_weights((1, 12, 12, 3, 2), (1, 24, 24, 6, 2))

    d1, d2 = str(tmp_path / 'm1'), str(tmp_path / 'm2')
    m1.save(d1)
    m2.save(d2)
    ms = MultiStepGan.load([d1, d2])
    assert ms.s_enhance == 4 and ms.t_enhance == 2
    assert ms.s_enhancements == [2, 2]
    lr = RNG.random((3, 6, 6, 2)).astype(np.float32)  # (t, s1, s2, f)
    out = ms.generate(lr)
    assert out.shape == (1, 24, 24, 6, 2)


def test_cond_mom_training(tmp_path):
    """Mom1 training reduces masked loss; Mom2 uses mom1 predictions."""
    features = ['u_100m', 'v_100m']
    train = make_fake_dset((20, 20, 40), features)
    handler = BatchHandlerMom1(
        [train], batch_size=2, n_batches=2, s_enhance=2, t_enhance=1,
        sample_shape=(8, 8, 1),
        queue_kwargs={'s_padding': 1, 't_padding': 0})
    model = Sup3rCondMom(_small_gen_s(), learning_rate=5e-3)
    out_dir = str(tmp_path / 'mom1_{epoch}')
    model.train(handler, input_resolution={'spatial': '30km',
                                           'temporal': '60min'},
                n_epoch=2, out_dir=out_dir)
    assert model.history is not None
    assert 'train_loss_gen' in model.history
    loaded = Sup3rCondMom.load(str(tmp_path / 'mom1_1'))
    lr = RNG.random((1, 5, 5, 2)).astype(np.float32)
    assert loaded.generate(lr).shape == (1, 10, 10, 2)

    # second moment queue driven by the trained first moment model
    handler2 = BatchHandlerMom2(
        [make_fake_dset((20, 20, 40), features)], batch_size=2,
        n_batches=1, s_enhance=2, t_enhance=1, sample_shape=(8, 8, 1),
        queue_kwargs={'lower_models': {1: loaded}})
    batch = next(iter(handler2))
    assert batch.output.shape == batch.high_res.shape
    assert (batch.output >= 0).all()  # squared target
    handler2.stop()


def test_cond_mom_sf_target():
    """Subfilter target = HR - enhanced LR."""
    features = ['u_100m']
    handler = BatchHandlerMom1SF(
        [make_fake_dset((16, 16, 30), features)], batch_size=2,
        n_batches=1, s_enhance=2, t_enhance=1, sample_shape=(8, 8, 1))
    batch = next(iter(handler))
    from sup3r_tpu.ops import spatial_simple_enhancing

    expected = batch.high_res - spatial_simple_enhancing(
        batch.low_res, 2)
    np.testing.assert_allclose(batch.output, expected, atol=1e-5)
    handler.stop()


def test_gan_dc_updates_weights():
    features = ['u_100m', 'v_100m']
    handler = BatchHandlerDC(
        [make_fake_dset((20, 20, 60), features)],
        [make_fake_dset((20, 20, 60), features)],
        batch_size=2, n_batches=2, s_enhance=2, t_enhance=1,
        sample_shape=(8, 8, 1), n_space_bins=2, n_time_bins=2)
    model = Sup3rGanDC(_small_gen_s(), _small_disc())
    w_before = np.asarray(handler.temporal_weights).copy()
    model.train(handler, input_resolution={'spatial': '30km',
                                           'temporal': '60min'},
                n_epoch=1, out_dir=None)
    assert 'val_loss_gen' in model.history
    # weights updated and still sum to 1
    np.testing.assert_allclose(np.sum(handler.temporal_weights), 1.0,
                               rtol=1e-5)
    np.testing.assert_allclose(np.sum(handler.spatial_weights), 1.0,
                               rtol=1e-5)


def test_solar_cc_training():
    """SolarCC trains on multiples of 24 hourly steps and pads its
    cropped output back to full length."""
    features = ['clearsky_ratio']
    handler = BatchHandler(
        [make_fake_dset((14, 14, 96), features)], batch_size=1,
        n_batches=1, s_enhance=1, t_enhance=24, sample_shape=(8, 8, 24))
    gen = [
        {'class': 'Conv3D', 'filters': 24, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
        {'class': 'SpatioTemporalExpansion', 'temporal_mult': 24,
         'temporal_method': 'depth_to_time', 't_roll': 12},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'Conv3D', 'filters': 1, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
    ]
    model = SolarCC(gen, _small_disc(True), loss='MeanAbsoluteError')
    model.train(handler, input_resolution={'spatial': '4km',
                                           'temporal': '1440min'},
                n_epoch=1, out_dir=None)
    assert model.history is not None
    lr = RNG.random((1, 8, 8, 2, 1)).astype(np.float32)
    out = model.generate(lr)
    assert out.shape == (1, 8, 8, 48, 1)


def test_gan_with_obs_training():
    features = ['u_100m', 'v_100m']
    gen = [
        {'class': 'Conv2D', 'filters': 32, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
        {'class': 'SpatialExpansion', 'spatial_mult': 2},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'Sup3rConcatObs', 'name': 'u_100m_obs'},
        {'class': 'Conv2D', 'filters': 2, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
    ]
    handler = BatchHandler(
        [make_fake_dset((20, 20, 30), features)], batch_size=2,
        n_batches=2, s_enhance=2, t_enhance=1, sample_shape=(8, 8, 1))
    model = Sup3rGanWithObs(
        gen, _small_disc(),
        onshore_obs_frac={'spatial_frac': [0.2, 0.4]},
        loss_obs_weight=0.5)
    assert model.obs_features == ['u_100m_obs']
    model.train(handler, input_resolution={'spatial': '30km',
                                           'temporal': '60min'},
                n_epoch=1, out_dir=None)
    assert model.hr_exo_features == []
    assert 'train_loss_obs' in model.history
    assert 0 < model.history['train_obs_frac'].values[-1] < 1


def test_gan_with_obs_load_resume(tmp_path):
    """Save/load/resume a trained WithObs model: obs configuration
    (fractions, loss weight, loss name) must survive the round trip
    and training must continue from the loaded weights (reference:
    tests/training/test_train_conditioned_obs.py:76-78)."""
    features = ['u_100m', 'v_100m']
    gen = [
        {'class': 'Conv2D', 'filters': 16, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
        {'class': 'SpatialExpansion', 'spatial_mult': 2},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'Sup3rConcatObs', 'name': 'u_100m_obs'},
        {'class': 'Conv2D', 'filters': 2, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
    ]
    handler = BatchHandler(
        [make_fake_dset((20, 20, 30), features)], batch_size=2,
        n_batches=1, s_enhance=2, t_enhance=1, sample_shape=(8, 8, 1))
    model = Sup3rGanWithObs(
        gen, _small_disc(),
        onshore_obs_frac={'spatial_frac': [0.2, 0.4]},
        loss_obs_weight=0.5)
    out_dir = os.path.join(tmp_path, 'obs_{epoch}')
    model.train(handler, input_resolution={'spatial': '30km',
                                           'temporal': '60min'},
                n_epoch=1, out_dir=out_dir)
    loaded = Sup3rGanWithObs.load(os.path.join(tmp_path, 'obs_0'))
    assert loaded.onshore_obs_frac == {'spatial_frac': [0.2, 0.4]}
    assert loaded.loss_obs_weight == 0.5
    assert loaded.loss_obs_name == model.loss_obs_name
    assert loaded.obs_features == ['u_100m_obs']
    np.testing.assert_array_equal(
        np.asarray(loaded.gen_params[0]['kernel']),
        np.asarray(model.gen_params[0]['kernel']))
    loaded.train(handler, input_resolution={'spatial': '30km',
                                            'temporal': '60min'},
                 n_epoch=1, out_dir=out_dir)
    assert len(loaded.history) == 2
    assert 'train_loss_obs' in loaded.history


def test_solar_multi_step_gan(tmp_path):
    """3-branch Sup3rCC chain: solar csr + wind -> temporal solar."""
    # spatial solar: csr only, 2x
    ssm = Sup3rGan(_small_gen_s(n_feats=1), _small_disc())
    ssm.meta.update(lr_features=['clearsky_ratio'],
                    hr_out_features=['clearsky_ratio'], s_enhance=2,
                    t_enhance=1)
    ssm.set_norm_stats({'clearsky_ratio': 0.5}, {'clearsky_ratio': 0.2})
    ssm.init_weights((1, 4, 4, 1), (1, 8, 8, 1))
    # spatial wind: u/v 2x
    swm = Sup3rGan(_small_gen_s(n_feats=2), _small_disc())
    swm.meta.update(lr_features=['u_200m', 'v_200m'],
                    hr_out_features=['u_200m', 'v_200m'], s_enhance=2,
                    t_enhance=1)
    swm.set_norm_stats({'u_200m': 0, 'v_200m': 0},
                       {'u_200m': 1, 'v_200m': 1})
    swm.init_weights((1, 4, 4, 2), (1, 8, 8, 2))
    # temporal solar: csr+u+v -> csr, 1x spatial, 4x temporal
    tsm = Sup3rGan(_small_gen_st(n_feats=1, s_mult=1, t_mult=4),
                   _small_disc(True))
    tsm.meta.update(
        lr_features=['clearsky_ratio', 'u_200m', 'v_200m'],
        hr_out_features=['clearsky_ratio'], s_enhance=1, t_enhance=4)
    tsm.set_norm_stats(
        {'clearsky_ratio': 0.5, 'u_200m': 0, 'v_200m': 0},
        {'clearsky_ratio': 0.2, 'u_200m': 1, 'v_200m': 1})
    tsm.init_weights((1, 8, 8, 3, 3), (1, 8, 8, 12, 1))

    dirs = {}
    for name, m in [('ssm', ssm), ('swm', swm), ('tsm', tsm)]:
        d = str(tmp_path / name)
        m.save(d)
        dirs[name] = d
    model = SolarMultiStepGan.load(dirs['ssm'], dirs['swm'],
                                   dirs['tsm'])
    assert model.s_enhance == 2 and model.t_enhance == 4
    lr = RNG.random((3, 4, 4, 3)).astype(np.float32)
    out = model.generate(lr)
    assert out.shape == (1, 8, 8, 12, 1)


def test_gan_dc_with_exo(tmp_path):
    """Data-centric GAN training with topography exo (reference:
    tests/training/test_train_exo_dc.py): DC bin weights update while
    the generator consumes a mid-network exo raster."""
    import os

    import numpy as np

    from sup3r_tpu.models import Sup3rGanDC
    from sup3r_tpu.preprocessing.batch_handlers import BatchHandlerDC
    from sup3r_tpu.utilities.test_helpers import make_fake_dset

    data = make_fake_dset((20, 20, 48),
                          ['u_100m', 'v_100m', 'topography'])
    handler = BatchHandlerDC(
        [data], [data], batch_size=2, n_batches=2, s_enhance=2,
        t_enhance=1, sample_shape=(8, 8, 4),
        feature_sets={'hr_exo_features': ['topography']},
        n_space_bins=4, n_time_bins=2)
    gen = {'hidden_layers': [
        {'class': 'Conv3D', 'filters': 8, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
        {'class': 'SpatioTemporalExpansion', 'spatial_mult': 2},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'Sup3rConcat', 'name': 'topography'},
        {'class': 'Conv3D', 'filters': 2, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'}]}
    disc = {'hidden_layers': [
        {'class': 'Conv3D', 'filters': 4, 'kernel_size': 3,
         'strides': 2, 'padding': 'same'},
        {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]}
    model = Sup3rGanDC(gen, disc, learning_rate=1e-4)
    model.train(handler, input_resolution={'spatial': '24km',
                                           'temporal': '60min'},
                n_epoch=2, weight_gen_advers=1e-4, train_gen=True,
                train_disc=True,
                out_dir=os.path.join(tmp_path, 'dc_{epoch}'))
    assert model.hr_exo_features == ['topography']
    # DC weights were pushed to the samplers and are normalized
    w = handler._queue.samplers[0].spatial_weights
    assert w is not None and np.isclose(np.sum(w), 1.0, atol=1e-5)


def test_surface_model_physics_exact():
    """Topography deltas shift temperature by exactly -lapse*dh and
    pressure by the barometric formula (reference:
    tests/forward_pass/test_surface_model.py:51-108)."""
    features = ['temperature_2m', 'pressure_0m']
    model = SurfaceSpatialMetModel(features, s_enhance=2,
                                   fix_bias=False)
    lr = np.stack([
        np.full((2, 6, 6), 20.0),
        np.full((2, 6, 6), 101325.0),
    ], axis=-1).astype(np.float32)
    lr_topo = np.full((6, 6), 100.0, np.float32)
    dh = 500.0
    hr_topo = np.full((12, 12), 100.0 + dh, np.float32)
    exo = {'topography': {'steps': [{'data': lr_topo},
                                    {'data': hr_topo}]}}
    out = model.generate(lr, exogenous_data=exo)
    # temperature drops by the lapse rate times the elevation gain
    np.testing.assert_allclose(
        out[..., 0], 20.0 - model.TEMP_LAPSE * dh, atol=1e-3)
    # barometric pressure correction: const * (1 - h/div)^exp ratio
    p_lr = 101325.0 * (1 - 100.0 / model.PRES_DIV) ** model.PRES_EXP \
        / (101325.0 * (1 - 0.0 / model.PRES_DIV) ** model.PRES_EXP)
    expected_hr = out[..., 1][0, 0, 0]
    assert expected_hr < 101325.0  # higher elevation -> lower pressure
    # pressure strictly decreases with added elevation
    hr_topo2 = np.full((12, 12), 100.0 + 2 * dh, np.float32)
    out2 = model.generate(lr, exogenous_data={
        'topography': {'steps': [{'data': lr_topo},
                                 {'data': hr_topo2}]}})
    assert out2[..., 1].mean() < out[..., 1].mean()
    assert out2[..., 0].mean() < out[..., 0].mean()


def test_surface_model_rh_regression():
    """RH shifts follow the fitted (delta_temp, delta_topo) regression
    weights (reference: test_surface_model.py:84-108)."""
    features = ['temperature_2m', 'relativehumidity_2m']
    model = SurfaceSpatialMetModel(features, s_enhance=2,
                                   fix_bias=False)
    lr = np.stack([
        np.full((1, 6, 6), 15.0),
        np.full((1, 6, 6), 60.0),
    ], axis=-1).astype(np.float32)
    lr_topo = np.zeros((6, 6), np.float32)
    dh = 1000.0
    hr_topo = np.full((12, 12), dh, np.float32)
    out = model.generate(lr, exogenous_data={
        'topography': {'steps': [{'data': lr_topo},
                                 {'data': hr_topo}]}})
    delta_temp = -model.TEMP_LAPSE * dh
    expected_rh = (60.0 + model.W_DELTA_TEMP * delta_temp
                   + model.W_DELTA_TOPO * dh)
    np.testing.assert_allclose(out[..., 1], expected_rh, atol=0.5)


def test_linear_interp_values_spatial():
    """Spatial linear interp matches a cell-centered 1D interpolation
    oracle (reference: tests/forward_pass/test_linear_model.py:12-29)."""
    from scipy.interpolate import interp1d

    model = LinearInterp(['f'], s_enhance=2, t_enhance=1)
    s_vals = RNG.uniform(0, 100, 3)
    lr = np.broadcast_to(s_vals[None, :], (3, 3)).T.copy()
    lr = lr[None, :, :, None, None].astype(np.float32)
    lr = np.repeat(lr, 2, axis=3)
    hr = model.generate(lr)
    assert hr.shape == (1, 6, 6, 2, 1)
    x = np.linspace(-0.25, 2.25, 6)
    truth = interp1d(np.arange(3), s_vals,
                     fill_value='extrapolate')(x)
    np.testing.assert_allclose(hr[0, :, 0, 0, 0], truth, rtol=1e-5)


def test_linear_interp_values_temporal():
    """Temporal linear interp matches the centered 1D oracle
    (reference: tests/forward_pass/test_linear_model.py:31-49)."""
    from scipy.interpolate import interp1d

    model = LinearInterp(['f'], s_enhance=1, t_enhance=3,
                         t_centered=True)
    t_vals = RNG.uniform(0, 100, 3)
    lr = np.ones((1, 2, 2, 3, 1), np.float32) * t_vals[None, None,
                                                       None, :, None]
    hr = model.generate(lr)
    assert hr.shape == (1, 2, 2, 9, 1)
    x = np.linspace(-1 / 3, 2 + 1 / 3, 9)
    truth = interp1d(np.arange(3), t_vals,
                     fill_value='extrapolate')(x)
    np.testing.assert_allclose(hr[0, 0, 0, :, 0], truth, rtol=1e-5)
