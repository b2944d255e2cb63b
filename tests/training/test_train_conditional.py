"""Full conditional-moment training sweep across every Mom* product,
spatial AND spatiotemporal, with end_t_padding / time_enhance_mode
variants (mirrors reference tests/training/test_train_conditional.py
parametrization)."""

import numpy as np
import pytest

from sup3r_tpu.models import Sup3rCondMom
from sup3r_tpu.preprocessing.batch_handlers import (
    BatchHandlerMom1,
    BatchHandlerMom1SF,
    BatchHandlerMom2,
    BatchHandlerMom2Sep,
    BatchHandlerMom2SepSF,
    BatchHandlerMom2SF,
)
from sup3r_tpu.utilities.test_helpers import make_fake_dset

FEATURES = ['u_100m', 'v_100m']


def _gen_s(n_feats=2, mult=2):
    return [
        {'class': 'Conv2D', 'filters': 8 * mult * mult,
         'kernel_size': 3, 'strides': 1, 'padding': 'same'},
        {'class': 'SpatialExpansion', 'spatial_mult': mult},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'Conv2D', 'filters': n_feats, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
    ]


def _gen_st(n_feats=2, s_mult=2, t_mult=2):
    return [
        {'class': 'Conv3D', 'filters': 8 * s_mult * s_mult,
         'kernel_size': 3, 'strides': 1, 'padding': 'same'},
        {'class': 'SpatioTemporalExpansion', 'spatial_mult': s_mult,
         'temporal_mult': t_mult, 'temporal_method': 'nearest'},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'Conv3D', 'filters': n_feats, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
    ]


def _needs_mom1(cls):
    return cls in (BatchHandlerMom2, BatchHandlerMom2SF)


@pytest.mark.parametrize(
    ('BatcherClass', 'spatiotemporal', 'end_t_padding',
     't_enhance_mode'),
    [
        (BatchHandlerMom1, True, False, 'constant'),
        (BatchHandlerMom1, True, True, 'constant'),
        (BatchHandlerMom1SF, True, False, 'linear'),
        (BatchHandlerMom2, True, False, 'constant'),
        (BatchHandlerMom2Sep, True, False, 'constant'),
        (BatchHandlerMom1, False, False, 'constant'),
        (BatchHandlerMom1SF, False, False, 'constant'),
        (BatchHandlerMom2, False, False, 'constant'),
        (BatchHandlerMom2SF, False, False, 'constant'),
        (BatchHandlerMom2Sep, False, False, 'constant'),
        (BatchHandlerMom2SepSF, False, False, 'constant'),
    ])
def test_train_conditional(tmp_path, BatcherClass, spatiotemporal,
                           end_t_padding, t_enhance_mode):
    """Each Mom* product trains end-to-end: loss history recorded,
    checkpoint reloads, generate() produces the enhanced shape
    (reference: test_train_conditional.py:183-260)."""
    s_enhance = 2
    t_enhance = 2 if spatiotemporal else 1
    sample_shape = (8, 8, 4) if spatiotemporal else (8, 8, 1)
    train = make_fake_dset((20, 20, 48), FEATURES)
    val = make_fake_dset((20, 20, 24), FEATURES)

    gen = _gen_st() if spatiotemporal else _gen_s()
    model = Sup3rCondMom(gen, learning_rate=5e-3)
    queue_kwargs = {'s_padding': 1, 't_padding': 0,
                    'end_t_padding': end_t_padding,
                    'time_enhance_mode': t_enhance_mode}
    if _needs_mom1(BatcherClass):
        mom1 = Sup3rCondMom(_gen_st() if spatiotemporal else _gen_s(),
                            learning_rate=5e-3)
        in_shape = ((1, 4, 4, 2, 2) if spatiotemporal
                    else (1, 4, 4, 2))
        mom1.init_weights(in_shape)
        mom1.set_norm_stats({f: 0.0 for f in FEATURES},
                            {f: 1.0 for f in FEATURES})
        queue_kwargs['lower_models'] = {1: mom1}

    handler = BatcherClass(
        [train], val_containers=[val], batch_size=2, n_batches=2,
        s_enhance=s_enhance, t_enhance=t_enhance,
        sample_shape=sample_shape, queue_kwargs=queue_kwargs)

    out_dir = str(tmp_path / 'mom_{epoch}')
    model.train(handler,
                input_resolution={'spatial': '12km',
                                  'temporal': '60min'},
                n_epoch=2, checkpoint_int=2, out_dir=out_dir)

    assert model.history is not None
    assert len(model.history) == 2
    assert 'train_loss_gen' in model.history
    assert np.isfinite(model.history['train_loss_gen']).all()
    # validation data ran too
    val_cols = [c for c in model.history if 'val' in c]
    assert val_cols and np.isfinite(
        model.history[val_cols[0]]).all()

    loaded = Sup3rCondMom.load(str(tmp_path / 'mom_1'))
    if spatiotemporal:
        lr = np.random.default_rng(0).random(
            (1, 5, 5, 3, 2)).astype(np.float32)
        out = loaded.generate(lr)
        assert out.shape == (1, 10, 10, 6, 2)
    else:
        lr = np.random.default_rng(0).random(
            (1, 5, 5, 2)).astype(np.float32)
        out = loaded.generate(lr)
        assert out.shape == (1, 10, 10, 2)
    assert np.isfinite(out).all()
    handler.stop()


def test_cond_mom_load_resume(tmp_path):
    """load() restores history + optimizer state so a resumed train
    continues the epoch index instead of restarting (reference
    semantics: sup3r/models/conditional.py train loop continues from
    len(history))."""
    train = make_fake_dset((20, 20, 24), FEATURES)
    model = Sup3rCondMom(_gen_s(), learning_rate=5e-3)
    handler = BatchHandlerMom1(
        [train], batch_size=2, n_batches=1, s_enhance=2, t_enhance=1,
        sample_shape=(8, 8, 1))
    out_dir = str(tmp_path / 'mom_{epoch}')
    model.train(handler, input_resolution={'spatial': '12km',
                                           'temporal': '60min'},
                n_epoch=1, out_dir=out_dir)
    loaded = Sup3rCondMom.load(str(tmp_path / 'mom_0'))
    assert loaded.history is not None and len(loaded.history) == 1
    assert loaded._gen_opt_state is not None
    np.testing.assert_array_equal(
        np.asarray(loaded.gen_params[0]['kernel']),
        np.asarray(model.gen_params[0]['kernel']))
    loaded.train(handler, input_resolution={'spatial': '12km',
                                            'temporal': '60min'},
                 n_epoch=1, out_dir=out_dir)
    assert len(loaded.history) == 2
    assert list(loaded.history.index) == [0, 1]
    handler.stop()


def test_end_t_padding_masks_tail():
    """end_t_padding zeroes the mask for the padded tail timesteps so
    the moment loss ignores them."""
    train = make_fake_dset((12, 12, 24), FEATURES)
    handler = BatchHandlerMom1(
        [train], batch_size=2, n_batches=1, s_enhance=2, t_enhance=2,
        sample_shape=(8, 8, 4),
        queue_kwargs={'end_t_padding': True})
    batch = next(iter(handler))
    assert hasattr(batch, 'mask')
    mask = np.asarray(batch.mask)
    # last t_enhance-1 hr timesteps masked out
    assert not mask[:, :, :, -1].any()
    assert mask[:, :, :, 0].any()
    handler.stop()


def test_time_enhance_mode_changes_lr():
    """'linear' vs 'constant' time enhancement produce different
    subfilter targets."""
    train = make_fake_dset((12, 12, 24), FEATURES)
    outs = {}
    for mode in ('constant', 'linear'):
        handler = BatchHandlerMom1SF(
            [train], batch_size=1, n_batches=1, s_enhance=1,
            t_enhance=4, sample_shape=(8, 8, 8),
            queue_kwargs={'time_enhance_mode': mode})
        batch = next(iter(handler))
        outs[mode] = np.asarray(batch.output).copy()
        handler.stop()
    assert not np.allclose(outs['constant'], outs['linear'])


@pytest.mark.parametrize('BatcherClass', [BatchHandlerMom1,
                                          BatchHandlerMom2Sep])
def test_train_conditional_with_topo_exo(BatcherClass):
    """Sup3rCondMom trains with a mid-network topography exo channel
    (reference: tests/training/test_train_conditional_exo.py).
    Mom2Sep covers the transformed-exo-target case: the step loss must
    pull exo channels from the TARGET, not raw hr, or a spurious loss
    term appears (caught in review)."""
    features = ['u_100m', 'v_100m', 'topography']
    train = make_fake_dset((20, 20, 24), features)
    handler = BatcherClass(
        [train], batch_size=2, n_batches=2, s_enhance=2, t_enhance=1,
        sample_shape=(8, 8, 1),
        feature_sets={'hr_exo_features': ['topography']})
    gen = [
        {'class': 'Conv2D', 'filters': 8 * 4, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
        {'class': 'SpatialExpansion', 'spatial_mult': 2},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'Sup3rConcat', 'name': 'topography'},
        {'class': 'Conv2D', 'filters': 2, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
    ]
    model = Sup3rCondMom(gen, learning_rate=5e-3)
    model.train(handler,
                input_resolution={'spatial': '12km',
                                  'temporal': '60min'},
                n_epoch=1, out_dir=None)
    assert model.hr_exo_features == ['topography']
    assert np.isfinite(model.history['train_loss_gen']).all()

    # the jitted step loss must agree with calc_loss (reference
    # semantics: exo term identically zero)
    import jax.numpy as jnp

    batch = next(iter(handler))
    model._build_train_step()
    step_loss = float(model._loss_fn(
        model.gen_params, jnp.asarray(batch.low_res, jnp.float32),
        jnp.asarray(batch.high_res, jnp.float32),
        jnp.asarray(batch.output, jnp.float32),
        jnp.asarray(batch.mask, jnp.float32)))
    out_gen = model._gen.apply(
        model.gen_params, jnp.asarray(batch.low_res, jnp.float32),
        exo={'topography': jnp.asarray(
            batch.high_res[..., 2:3], jnp.float32)})
    ref_loss, _ = model.calc_loss(
        jnp.asarray(batch.output, jnp.float32), out_gen,
        jnp.asarray(batch.mask, jnp.float32))
    np.testing.assert_allclose(step_loss, float(ref_loss), rtol=1e-5)
    handler.stop()
