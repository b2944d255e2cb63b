"""SolarCC validation must score DAYLIGHT WINDOWS, not the generic
full-24h val step (reference: solar models validate through the same
``calc_loss`` as training — sup3r/models/solar_cc.py:31-250 +
base.py:913-943). Regression for the round-4 val-step refactor, which
bypassed the subclass loss: a Dense discriminator initialized on
DAYLIGHT_HOURS windows crashed on full-day tensors, and conv-only
discs silently validated with non-training semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sup3r_tpu.models import SolarCC
from sup3r_tpu.preprocessing.batch_handlers import BatchHandler
from sup3r_tpu.utilities.test_helpers import make_fake_dset

RNG = np.random.default_rng(0)


def _solar_model():
    gen = [
        {'class': 'Conv3D', 'filters': 24, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
        {'class': 'SpatioTemporalExpansion', 'temporal_mult': 24,
         'temporal_method': 'depth_to_time', 't_roll': 12},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'Conv3D', 'filters': 1, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
    ]
    # Dense disc: its input length is FIXED at DAYLIGHT_HOURS by
    # SolarCC.init_weights — a val step handing it the full 24h
    # window is a loud shape error (the regression's crash mode)
    disc = [
        {'class': 'Conv3D', 'filters': 4, 'kernel_size': 3,
         'strides': 2, 'padding': 'same'},
        {'class': 'Flatten'},
        {'class': 'Dense', 'units': 1},
    ]
    return SolarCC(gen, disc, loss='MeanAbsoluteError')


def test_solar_val_loss_uses_daylight_windows():
    features = ['clearsky_ratio']
    handler = BatchHandler(
        [make_fake_dset((14, 14, 96), features)],
        val_containers=[make_fake_dset((14, 14, 96), features)],
        batch_size=1, n_batches=1, s_enhance=1, t_enhance=24,
        sample_shape=(8, 8, 24))
    model = _solar_model()
    model.init_weights((1, 8, 8, 1, 1), (1, 8, 8, 24, 1))

    w_adv = 0.001
    details = model.calc_val_loss(handler, w_adv)
    assert details, 'no validation batches consumed'
    for k in ('val_loss_gen', 'val_loss_gen_content',
              'val_loss_gen_advers', 'val_loss_disc'):
        assert k in details and np.isfinite(details[k]), (k, details)

    # the jitted val step must agree with the eager daylight-window
    # calc_loss on an identical batch
    lr = RNG.random((2, 8, 8, 1, 1)).astype(np.float32)
    hr = RNG.random((2, 8, 8, 24, 1)).astype(np.float32)
    step = model._get_val_step_fn()
    got = step(model.gen_params, model.disc_params, jnp.asarray(lr),
               jnp.asarray(hr), jnp.float32(w_adv),
               jax.random.PRNGKey(0))
    out = model.generate(lr)  # temporal_pad included
    loss, ref = model.calc_loss(jnp.asarray(hr), jnp.asarray(out),
                                weight_gen_advers=w_adv,
                                train_gen=True, compute_disc=True)
    np.testing.assert_allclose(float(got['loss_gen']), float(loss),
                               rtol=1e-5)
    np.testing.assert_allclose(float(got['loss_gen_content']),
                               float(ref['loss_gen_content']),
                               rtol=1e-5)
    np.testing.assert_allclose(float(got['loss_disc']),
                               float(ref['loss_disc']), rtol=1e-5)
    handler.stop()


def test_with_obs_val_loss_includes_obs_term():
    """Sup3rGanWithObs validation must carry the obs loss term and
    report val_loss_obs / val_loss_non_obs, matching the training
    loss semantics (reference with_obs.py:245-279 routes validation
    through the shared _get_hr_exo_and_loss). Regression: the generic
    val step injected the masked obs exo but dropped
    obs_weight*loss_obs from loss_gen/loss_gen_content."""
    from sup3r_tpu.models import Sup3rGanWithObs

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
    disc = [
        {'class': 'Conv2D', 'filters': 4, 'kernel_size': 3,
         'strides': 2, 'padding': 'same'},
        {'class': 'Flatten'}, {'class': 'Dense', 'units': 1},
    ]
    handler = BatchHandler(
        [make_fake_dset((20, 20, 30), features)],
        val_containers=[make_fake_dset((20, 20, 30), features)],
        batch_size=2, n_batches=1, s_enhance=2, t_enhance=1,
        sample_shape=(8, 8, 1))

    def build(w):
        m = Sup3rGanWithObs(
            gen, disc, onshore_obs_frac={'spatial_frac': 0.3},
            loss_obs_weight=w)
        # sample_shape (8, 8, 1) at s_enhance=2 -> hr samples are 8x8
        m.init_weights((1, 4, 4, 2), (1, 8, 8, 2), seed=3)
        return m

    m0 = build(0.0)
    m1 = build(10.0)
    details = m1.calc_val_loss(handler, 0.001)
    for k in ('val_loss_obs', 'val_loss_non_obs', 'val_obs_frac',
              'val_loss_gen', 'val_loss_gen_content'):
        assert k in details and np.isfinite(details[k]), (k, details)
    handler.stop()

    # identical weights, batch, and mask key: only the obs WEIGHT
    # differs, so the content term must shift by exactly w * loss_obs
    lr = RNG.random((2, 4, 4, 2)).astype(np.float32)
    hr = RNG.random((2, 8, 8, 2)).astype(np.float32)
    key = jax.random.PRNGKey(7)
    w = jnp.float32(0.001)
    d0 = m0._get_val_step_fn()(m0.gen_params, m0.disc_params,
                               jnp.asarray(lr), jnp.asarray(hr), w,
                               key)
    d1 = m1._get_val_step_fn()(m1.gen_params, m1.disc_params,
                               jnp.asarray(lr), jnp.asarray(hr), w,
                               key)
    np.testing.assert_allclose(float(d0['loss_obs']),
                               float(d1['loss_obs']), rtol=1e-6)
    np.testing.assert_allclose(
        float(d1['loss_gen_content']) - float(d0['loss_gen_content']),
        10.0 * float(d1['loss_obs']), rtol=1e-4)
    assert 0 < float(d1['obs_frac']) < 1


def test_solar_train_epoch_reports_val_losses():
    """End-to-end: train() with val containers produces finite val_*
    entries in the history (the crash mode would kill the epoch)."""
    features = ['clearsky_ratio']
    handler = BatchHandler(
        [make_fake_dset((14, 14, 96), features)],
        val_containers=[make_fake_dset((14, 14, 48), features)],
        batch_size=1, n_batches=1, s_enhance=1, t_enhance=24,
        sample_shape=(8, 8, 24))
    model = _solar_model()
    model.train(handler, input_resolution={'spatial': '4km',
                                           'temporal': '1440min'},
                n_epoch=1, out_dir=None)
    hist = model.history
    assert hist is not None
    assert 'val_loss_gen' in hist.columns
    assert np.isfinite(hist['val_loss_gen']).all()
