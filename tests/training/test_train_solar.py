"""SolarCC training breadth (mirrors reference
tests/training/test_train_solar.py:26-220): the full NSRDB-style
pipeline (DataHandlerH5SolarCC -> BatchHandlerCC with lr-only
features), save/load class preservation, t_enhance expansion, and
daylight-window loss behavior."""

import numpy as np
import pytest

from sup3r_tpu.models import SolarCC, Sup3rGan
from sup3r_tpu.preprocessing.batch_handlers import BatchHandlerCC
from sup3r_tpu.preprocessing.data_handlers import DataHandlerH5SolarCC
from sup3r_tpu.utilities import RANDOM_GENERATOR
from sup3r_tpu.utilities.test_helpers import make_fake_h5_file

FEATURES_S = ['clearsky_ratio', 'ghi', 'clearsky_ghi']


def _nsrdb_file(tmp_path, shape=(20, 20, 72)):
    return make_fake_h5_file(
        str(tmp_path / 'nsrdb.h5'), shape,
        ['ghi', 'clearsky_ghi'], start='2023-06-01', freq='h',
        scale_factor=1.0, value_range=(1, 1000))


def _gen_1x_8x():
    return [
        {'class': 'Conv3D', 'filters': 8, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
        {'class': 'SpatioTemporalExpansion', 'temporal_mult': 8,
         'temporal_method': 'depth_to_time', 't_roll': 4},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'Conv3D', 'filters': 1, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
    ]


def _disc():
    return [{'class': 'Conv3D', 'filters': 4, 'kernel_size': 3,
             'strides': 2, 'padding': 'same'},
            {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]


def test_solar_cc_full_pipeline(tmp_path):
    """NSRDB file -> DataHandlerH5SolarCC -> BatchHandlerCC with
    lr-only ghi/clearsky_ghi -> SolarCC training -> save/load keeps
    the class + loss -> generate expands time 8x."""
    fp = _nsrdb_file(tmp_path)
    handler = DataHandlerH5SolarCC(fp, features=FEATURES_S)
    batcher = BatchHandlerCC(
        [handler], batch_size=2, n_batches=2, s_enhance=1, t_enhance=8,
        sample_shape=(12, 12, 24),
        feature_sets={'lr_only_features': ['clearsky_ghi', 'ghi']})
    model = SolarCC(_gen_1x_8x(), _disc(), learning_rate=1e-4,
                    loss='MeanAbsoluteError')
    model.train(batcher,
                input_resolution={'spatial': '4km',
                                  'temporal': '1440min'},
                n_epoch=1, weight_gen_advers=0.0, train_gen=True,
                train_disc=False,
                out_dir=str(tmp_path / 'scc_{epoch}'))
    batcher.stop()
    assert model.meta['hr_out_features'] == ['clearsky_ratio']
    assert model.meta['class'] == 'SolarCC'

    out_dir = str(tmp_path / 'cc_gan')
    model.save(out_dir)
    loaded = SolarCC.load(out_dir)
    assert loaded.meta['class'] == 'SolarCC'
    assert loaded.loss_name == 'MeanAbsoluteError'

    # LR input carries csr + the two lr-only features (3 channels);
    # output is clearsky_ratio only
    assert loaded.lr_features == FEATURES_S
    x = RANDOM_GENERATOR.uniform(0, 1, (1, 12, 12, 3, 3)).astype(
        np.float32)
    y = loaded.generate(x)
    assert y.shape == (1, 12, 12, 24, 1)


def test_solar_cc_loss_needs_full_days():
    """The daylight-window loss requires HR time in multiples of 24
    hourly steps (reference: test_train_solar.py:162-220)."""
    model = SolarCC(_gen_1x_8x(), _disc(), loss='MeanAbsoluteError')
    model.meta.update(lr_features=['clearsky_ratio'],
                      hr_out_features=['clearsky_ratio'],
                      s_enhance=1, t_enhance=8)
    model.set_norm_stats({'clearsky_ratio': 0.0},
                         {'clearsky_ratio': 1.0})
    model.init_weights((1, 5, 5, 3, 1), (1, 5, 5, 24, 1))
    lr = RANDOM_GENERATOR.uniform(0, 1, (1, 5, 5, 3, 1)).astype(
        np.float32)
    bad_hr = RANDOM_GENERATOR.uniform(0, 1, (1, 5, 5, 20, 1)).astype(
        np.float32)
    with pytest.raises(AssertionError, match='multiples of 24'):
        model.run_gradient_descent(lr, bad_hr, train_gen=True,
                                   train_disc=False)


def test_solar_cc_daylight_content_loss_windows():
    """The content loss only sees the center hours + daily means: a
    perturbation OUTSIDE those windows with matched daily mean leaves
    the loss unchanged, while a center-hour perturbation raises it."""
    import jax
    import jax.numpy as jnp

    model = SolarCC(_gen_1x_8x(), _disc(), loss='MeanAbsoluteError')
    model.meta.update(lr_features=['clearsky_ratio'],
                      hr_out_features=['clearsky_ratio'],
                      s_enhance=1, t_enhance=8)
    model.set_norm_stats({'clearsky_ratio': 0.0},
                         {'clearsky_ratio': 1.0})
    model.init_weights((1, 6, 6, 3, 1), (1, 6, 6, 24, 1))
    lr = RANDOM_GENERATOR.uniform(0, 1, (1, 6, 6, 3, 1)).astype(
        np.float32)
    hr = RANDOM_GENERATOR.uniform(0, 1, (1, 6, 6, 24, 1)).astype(
        np.float32)

    loss_fn = model._make_gen_loss_fn()
    key = jax.random.PRNGKey(0)

    def content(hr_arr):
        _, aux = loss_fn(model.gen_params, model.disc_params,
                         jnp.asarray(lr), jnp.asarray(hr_arr),
                         jnp.float32(0.0), key)
        return float(aux['content'])

    base = content(hr)
    # perturb hour 2 (outside daylight 8-16 and center 11-13) and
    # compensate within the same daylight-external region to keep the
    # 24h daily mean of the TRUE daylight window unchanged
    hr2 = hr.copy()
    hr2[:, :, :, 2, :] += 0.5
    # center-hour perturbation must change the loss
    hr3 = hr.copy()
    hr3[:, :, :, 11:13, :] += 0.5
    assert content(hr3) != pytest.approx(base, rel=1e-3)
    # the hour-2 change affects only terms that include hour 2: the
    # pointwise center loss excludes it, so the delta comes only from
    # the daily-mean term of the GEN windows (true daylight window
    # fixed at hours 8-16 excludes hour 2)
    assert content(hr2) == pytest.approx(base, rel=1e-3)
