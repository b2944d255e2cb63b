"""Mixed-precision training flag (train_dtype='bfloat16'): fp32
master weights/optimizer with a bf16 network body. Convergence parity
vs fp32 on a tiny run — the correctness bar for the opt-in flag
(docs/PERFORMANCE.md carries the measured speed ablation). Every
trainable family with its own jitted loss fns (Sup3rGan, SolarCC,
Sup3rGanWithObs, Sup3rCondMom) is covered — the flag must never
silently no-op in a subclass."""

import numpy as np

import sup3r_tpu.utilities.utilities as uu
from sup3r_tpu.models import (
    SolarCC,
    Sup3rCondMom,
    Sup3rGan,
    Sup3rGanWithObs,
)
from sup3r_tpu.preprocessing import BatchHandler, DataHandler
from sup3r_tpu.preprocessing.batch_handlers import (
    BatchHandlerCC,
    BatchHandlerMom1,
)
from sup3r_tpu.preprocessing.data_handlers import DataHandlerH5SolarCC
from sup3r_tpu.utilities.test_helpers import (
    make_fake_dset,
    make_fake_h5_file,
)

FEATURES = ['windspeed_100m', 'winddirection_100m']


def _reseed():
    uu.RANDOM_GENERATOR.bit_generator.state = np.random.default_rng(
        seed=77).bit_generator.state


def _gen():
    return [
        {'class': 'FlexiblePadding',
         'paddings': [[0, 0], [1, 1], [1, 1], [1, 1], [0, 0]],
         'mode': 'REFLECT'},
        {'class': 'Conv3D', 'filters': 8, 'kernel_size': 3,
         'strides': 1},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'SpatioTemporalExpansion', 'spatial_mult': 2,
         'temporal_mult': 2, 'temporal_method': 'nearest'},
        {'class': 'Conv3D', 'filters': 2, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
    ]


def _disc():
    return [{'class': 'Conv3D', 'filters': 4, 'kernel_size': 3,
             'strides': 2, 'padding': 'same'},
            {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]


def _train_once(path, dtype):
    _reseed()
    handler = DataHandler(path, features=FEATURES)
    bh = BatchHandler([handler], batch_size=4, n_batches=3,
                      s_enhance=2, t_enhance=2, sample_shape=(8, 8, 4),
                      max_workers=1)
    model = Sup3rGan(_gen(), _disc(), learning_rate=1e-3)
    model.train_dtype = dtype
    model.init_weights((1, 4, 4, 2, 2), (1, 8, 8, 4, 2), seed=5)
    model.train(bh, input_resolution={'spatial': '30km',
                                      'temporal': '60min'},
                n_epoch=2, out_dir=None)
    bh.stop()
    hist = model.history
    kern = next(p for p in model.gen_params if 'kernel' in p)
    return hist, np.asarray(kern['kernel'])


def test_bf16_train_converges_like_fp32(tmp_path):
    """Same data/seeds: the bf16-body run's loss trajectory tracks
    fp32 closely (bf16 has ~2^-8 relative rounding; the tiny net's
    losses agree to ~1e-3), master weights stay float32, and both
    runs optimize (loss decreases or stays finite)."""
    path = make_fake_h5_file(
        str(tmp_path / 'wtk.h5'), (16, 16, 40), FEATURES,
        value_range=(0, 20))
    hist32, w32 = _train_once(path, None)
    hist16, w16 = _train_once(path, 'bfloat16')

    assert w16.dtype == np.float32
    for col in ('train_loss_gen', 'train_loss_disc'):
        a = hist32[col].to_numpy(dtype=float)
        b = hist16[col].to_numpy(dtype=float)
        assert np.isfinite(a).all() and np.isfinite(b).all()
        np.testing.assert_allclose(b, a, rtol=0.05, atol=0.02)
    # the two runs genuinely took different compute paths
    assert not np.array_equal(w32, w16)
    # and end in nearby weight space (same trajectory, bf16 noise)
    np.testing.assert_allclose(w16, w32, rtol=0, atol=0.01)


def _check_family_pair(train_once, loss_cols, atol_w=0.01):
    """Run a family's tiny training twice (fp32 then bf16) and apply
    the shared assertions: finite tracking losses, a genuinely
    different compute path, fp32 master weights, nearby endpoints."""
    hist32, w32 = train_once(None)
    hist16, w16 = train_once('bfloat16')
    assert w16.dtype == np.float32
    for col in loss_cols:
        a = hist32[col].to_numpy(dtype=float)
        b = hist16[col].to_numpy(dtype=float)
        assert np.isfinite(a).all() and np.isfinite(b).all()
        np.testing.assert_allclose(b, a, rtol=0.05, atol=0.02)
    assert not np.array_equal(w32, w16)
    np.testing.assert_allclose(w16, w32, rtol=0, atol=atol_w)


def test_bf16_train_cond_mom(tmp_path):
    """Sup3rCondMom builds its own single-net step
    (conditional.py _build_train_step) — the cast must reach it."""

    def train_once(dtype):
        _reseed()
        train = make_fake_dset((20, 20, 48), FEATURES)
        bh = BatchHandlerMom1(
            [train], batch_size=4, n_batches=3, s_enhance=2,
            t_enhance=2, sample_shape=(8, 8, 4), max_workers=1,
            queue_kwargs={'s_padding': 1, 't_padding': 0,
                          'end_t_padding': False,
                          'time_enhance_mode': 'constant'})
        model = Sup3rCondMom(
            [{'class': 'Conv3D', 'filters': 32, 'kernel_size': 3,
              'strides': 1, 'padding': 'same'},
             {'class': 'SpatioTemporalExpansion', 'spatial_mult': 2,
              'temporal_mult': 2, 'temporal_method': 'nearest'},
             {'class': 'LeakyReLU', 'alpha': 0.2},
             {'class': 'Conv3D', 'filters': 2, 'kernel_size': 3,
              'strides': 1, 'padding': 'same'}], learning_rate=5e-3)
        model.train_dtype = dtype
        model.init_weights((1, 4, 4, 2, 2), seed=5)
        model.train(bh, input_resolution={'spatial': '30km',
                                          'temporal': '60min'},
                    n_epoch=2, out_dir=None)
        bh.stop()
        kern = next(p for p in model.gen_params if 'kernel' in p)
        return model.history, np.asarray(kern['kernel'])

    # lr=5e-3 is 5x the gan test's, so per-step bf16 noise integrates
    # into proportionally larger endpoint drift
    _check_family_pair(train_once, ['train_loss_gen'], atol_w=0.03)


def test_bf16_train_solar_cc(tmp_path):
    """SolarCC overrides BOTH loss fns with daylight-window disc
    slicing (solar_cc.py) — the cast must reach the windowed disc
    applies too (train_disc=True exercises the disc step)."""
    fp = make_fake_h5_file(
        str(tmp_path / 'nsrdb.h5'), (20, 20, 72),
        ['ghi', 'clearsky_ghi'], start='2023-06-01', freq='h',
        scale_factor=1.0, value_range=(1, 1000))

    def train_once(dtype):
        _reseed()
        handler = DataHandlerH5SolarCC(
            fp, features=['clearsky_ratio', 'ghi', 'clearsky_ghi'])
        bh = BatchHandlerCC(
            [handler], batch_size=2, n_batches=2, s_enhance=1,
            t_enhance=8, sample_shape=(12, 12, 24),
            feature_sets={'lr_only_features': ['clearsky_ghi',
                                               'ghi']},
            max_workers=1)
        model = SolarCC(
            [{'class': 'Conv3D', 'filters': 8, 'kernel_size': 3,
              'strides': 1, 'padding': 'same'},
             {'class': 'SpatioTemporalExpansion', 'temporal_mult': 8,
              'temporal_method': 'depth_to_time', 't_roll': 4},
             {'class': 'LeakyReLU', 'alpha': 0.2},
             {'class': 'Conv3D', 'filters': 1, 'kernel_size': 3,
              'strides': 1, 'padding': 'same'}],
            [{'class': 'Conv3D', 'filters': 4, 'kernel_size': 3,
              'strides': 2, 'padding': 'same'},
             {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}],
            learning_rate=1e-4, loss='MeanAbsoluteError')
        model.train_dtype = dtype
        model.train(bh, input_resolution={'spatial': '4km',
                                          'temporal': '1440min'},
                    n_epoch=2, weight_gen_advers=1e-4, train_gen=True,
                    train_disc=True, disc_loss_bounds=(0.0, 1e6),
                    out_dir=None)
        bh.stop()
        kern = next(p for p in model.gen_params if 'kernel' in p)
        return model.history, np.asarray(kern['kernel'])

    _check_family_pair(train_once,
                       ['train_loss_gen', 'train_loss_disc'])


def test_bf16_train_with_obs(tmp_path):
    """Sup3rGanWithObs overrides the gen loss fn with NaN-masked obs
    channels (with_obs.py) — bf16 must propagate the NaN mask and the
    obs losses identically."""

    def train_once(dtype):
        _reseed()
        train = make_fake_dset((20, 20, 30), ['u_100m', 'v_100m'])
        bh = BatchHandler([train], batch_size=2, n_batches=2,
                          s_enhance=2, t_enhance=1,
                          sample_shape=(8, 8, 1), max_workers=1)
        model = Sup3rGanWithObs(
            [{'class': 'Conv2D', 'filters': 16, 'kernel_size': 3,
              'strides': 1, 'padding': 'same'},
             {'class': 'SpatialExpansion', 'spatial_mult': 2},
             {'class': 'LeakyReLU', 'alpha': 0.2},
             {'class': 'Sup3rConcatObs', 'name': 'u_100m_obs'},
             {'class': 'Conv2D', 'filters': 2, 'kernel_size': 3,
              'strides': 1, 'padding': 'same'}],
            [{'class': 'Conv2D', 'filters': 4, 'kernel_size': 3,
              'strides': 2, 'padding': 'same'},
             {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}],
            onshore_obs_frac={'spatial_frac': [0.2, 0.4]},
            loss_obs_weight=0.5)
        model.train_dtype = dtype
        model.train(bh, input_resolution={'spatial': '30km',
                                          'temporal': '60min'},
                    n_epoch=2, out_dir=None)
        bh.stop()
        kern = next(p for p in model.gen_params if 'kernel' in p)
        return model.history, np.asarray(kern['kernel'])

    _check_family_pair(train_once,
                       ['train_loss_gen', 'train_loss_obs'])
