"""GAN training integration tests (mirrors reference
tests/training/test_train_gan.py:49-122)."""

import os

import numpy as np
import pytest

from sup3r_tpu.configs import get_config
from sup3r_tpu.models import Sup3rGan
from sup3r_tpu.preprocessing import BatchHandler
from sup3r_tpu.utilities.test_helpers import make_fake_dset


def _handler(s_enhance, t_enhance, sample_shape, features=('u_100m',
                                                           'v_100m'),
             **kwargs):
    train = make_fake_dset((20, 20, 60), list(features))
    val = make_fake_dset((20, 20, 30), list(features))
    return BatchHandler(
        [train], [val], batch_size=2, n_batches=2, s_enhance=s_enhance,
        t_enhance=t_enhance, sample_shape=sample_shape, **kwargs)


def _small_gen_s(n_feats=2, mult=2):
    return {'hidden_layers': [
        {'class': 'FlexiblePadding',
         'paddings': [[0, 0], [3, 3], [3, 3], [0, 0]], 'mode': 'REFLECT'},
        {'class': 'Conv2DTranspose', 'filters': 16, 'kernel_size': 3,
         'strides': 1, 'activation': 'relu'},
        {'class': 'Cropping2D', 'cropping': 4},
        {'class': 'SkipConnection', 'name': 'a'},
        {'class': 'FlexiblePadding',
         'paddings': [[0, 0], [3, 3], [3, 3], [0, 0]], 'mode': 'REFLECT'},
        {'class': 'Conv2DTranspose', 'filters': 16, 'kernel_size': 3,
         'strides': 1, 'activation': None},
        {'class': 'Cropping2D', 'cropping': 4},
        {'class': 'SkipConnection', 'name': 'a'},
        {'class': 'FlexiblePadding',
         'paddings': [[0, 0], [3, 3], [3, 3], [0, 0]], 'mode': 'REFLECT'},
        {'class': 'Conv2DTranspose', 'filters': 16 * mult * mult,
         'kernel_size': 3, 'strides': 1, 'activation': None},
        {'class': 'Cropping2D', 'cropping': 4},
        {'class': 'SpatialExpansion', 'spatial_mult': mult},
        {'class': 'Activation', 'activation': 'relu'},
        {'class': 'FlexiblePadding',
         'paddings': [[0, 0], [3, 3], [3, 3], [0, 0]], 'mode': 'REFLECT'},
        {'class': 'Conv2DTranspose', 'filters': n_feats, 'kernel_size': 3,
         'strides': 1, 'activation': None},
        {'class': 'Cropping2D', 'cropping': 4},
    ]}


def _small_gen_st(n_feats=2, s_mult=2, t_mult=2):
    pad = {'class': 'FlexiblePadding',
           'paddings': [[0, 0], [3, 3], [3, 3], [3, 3], [0, 0]],
           'mode': 'REFLECT'}
    return {'hidden_layers': [
        dict(pad),
        {'class': 'Conv3D', 'filters': 8, 'kernel_size': 3, 'strides': 1},
        {'class': 'Cropping3D', 'cropping': 2},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'SpatioTemporalExpansion', 'temporal_mult': t_mult,
         'temporal_method': 'nearest'},
        dict(pad),
        {'class': 'Conv3D', 'filters': 8 * s_mult * s_mult,
         'kernel_size': 3, 'strides': 1},
        {'class': 'Cropping3D', 'cropping': 2},
        {'class': 'SpatioTemporalExpansion', 'spatial_mult': s_mult},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        dict(pad),
        {'class': 'Conv3D', 'filters': n_feats, 'kernel_size': 3,
         'strides': 1},
        {'class': 'Cropping3D', 'cropping': 2},
    ]}


def test_train_spatial(tmp_path):
    """Spatial GAN: weights change, history exists, save/load round trip
    preserves outputs and meta."""
    handler = _handler(2, 1, (10, 10, 1))
    model = Sup3rGan(_small_gen_s(), get_config('spatial/disc_test'),
                     learning_rate=1e-4)
    out_dir = os.path.join(tmp_path, 'gan_{epoch}')
    model.train(handler, input_resolution={'spatial': '30km',
                                           'temporal': '60min'},
                n_epoch=2, weight_gen_advers=1e-2,
                train_gen=True, train_disc=True, out_dir=out_dir,
                checkpoint_int=1)

    assert model.history is not None
    assert len(model.history) == 2
    assert 'train_loss_gen' in model.history
    assert 'val_loss_gen' in model.history
    assert model.meta['s_enhance'] == 2
    assert model.lr_features == ['u_100m', 'v_100m']
    assert model.hr_out_features == ['u_100m', 'v_100m']

    # generate in physical units
    lr = np.random.default_rng(0).random((1, 8, 8, 2)).astype(np.float32)
    out = model.generate(lr)
    assert out.shape == (1, 16, 16, 2)

    # save/load round trip
    final_dir = os.path.join(tmp_path, 'gan_1')
    assert os.path.exists(os.path.join(final_dir, 'model_params.json'))
    loaded = Sup3rGan.load(final_dir)
    assert loaded.meta['s_enhance'] == 2
    out2 = loaded.generate(lr)
    np.testing.assert_allclose(out, out2, rtol=1e-5, atol=1e-6)
    assert len(loaded.history) == 2


def test_train_st():
    """Spatiotemporal GAN trains and the generator weights move."""
    handler = _handler(2, 2, (8, 8, 8))
    model = Sup3rGan(_small_gen_st(),
                     {'hidden_layers': [
                         {'class': 'Conv3D', 'filters': 8,
                          'kernel_size': 3, 'strides': 2,
                          'padding': 'same'},
                         {'class': 'LeakyReLU', 'alpha': 0.2},
                         {'class': 'Flatten'},
                         {'class': 'Dense', 'units': 1}]},
                     learning_rate=1e-4)
    model.init_weights((1, 4, 4, 4, 2), (1, 8, 8, 8, 2))
    w_before = np.asarray(model.gen_params[1]['kernel']).copy()
    model.train(handler, input_resolution={'spatial': '30km',
                                           'temporal': '60min'},
                n_epoch=1, weight_gen_advers=1e-2, out_dir=None)
    w_after = np.asarray(model.gen_params[1]['kernel'])
    assert not np.allclose(w_before, w_after)
    assert model.meta['t_enhance'] == 2


def test_disc_gating():
    """With disc loss bounds set to extremes, the disc never trains and
    disc_train_frac is 0."""
    handler = _handler(2, 1, (10, 10, 1))
    model = Sup3rGan(_small_gen_s(), get_config('spatial/disc_test'))
    model.train(handler, input_resolution={'spatial': '30km',
                                           'temporal': '60min'},
                n_epoch=1, disc_loss_bounds=(np.inf, np.inf),
                out_dir=None)
    assert model.history['train_disc_train_frac'].values[-1] == 0.0

    handler2 = _handler(2, 1, (10, 10, 1))
    model2 = Sup3rGan(_small_gen_s(), get_config('spatial/disc_test'))
    model2.train(handler2, input_resolution={'spatial': '30km',
                                            'temporal': '60min'},
                 n_epoch=1, disc_loss_bounds=(-np.inf, np.inf),
                 out_dir=None)
    assert model2.history['train_disc_train_frac'].values[-1] == 1.0


def test_train_exo_features():
    """Training with topography as an hr_exo feature: content loss
    excludes the exo channel and generate() requires exo input."""
    features = ['u_100m', 'v_100m', 'topography']
    handler = _handler(2, 1, (10, 10, 1), features=features,
                       feature_sets={'hr_exo_features': ['topography']})
    gen_cfg = _small_gen_s(n_feats=2)
    gen_cfg['hidden_layers'].insert(
        -3, {'class': 'Sup3rConcat', 'name': 'topography'})
    model = Sup3rGan(gen_cfg, get_config('spatial/disc_test'))
    model.train(handler, input_resolution={'spatial': '30km',
                                           'temporal': '60min'},
                n_epoch=1, out_dir=None)
    assert model.hr_exo_features == ['topography']
    assert model.hr_out_features == ['u_100m', 'v_100m']

    lr = np.random.default_rng(0).random((1, 5, 5, 3)).astype(np.float32)
    with pytest.raises(KeyError, match='topography'):
        model.generate(lr)
    topo = np.random.default_rng(1).random((1, 10, 10, 1)).astype(
        np.float32)
    out = model.generate(lr, exogenous_data={'topography': topo})
    assert out.shape == (1, 10, 10, 2)


def test_early_stopping():
    """Early stop triggers when the monitored column stops improving."""
    import pandas as pd

    history = pd.DataFrame({'val_loss_gen': [1.0] * 8})
    assert Sup3rGan.early_stop(history, 'val_loss_gen', threshold=0.01,
                               n_epoch=5)
    history2 = pd.DataFrame({'val_loss_gen': np.linspace(2, 1, 8)})
    assert not Sup3rGan.early_stop(history2, 'val_loss_gen',
                                   threshold=0.01, n_epoch=5)


def test_training_resume_extends_history(tmp_path):
    """load() then train() continues epochs from the history index
    (reference: sup3r/models/base.py:739-743)."""
    handler = _handler(2, 1, (10, 10, 1))
    model = Sup3rGan(_small_gen_s(), get_config('spatial/disc_test'))
    out_dir = os.path.join(tmp_path, 'gan_{epoch}')
    model.train(handler, input_resolution={'spatial': '30km',
                                           'temporal': '60min'},
                n_epoch=2, out_dir=out_dir)
    loaded = Sup3rGan.load(os.path.join(tmp_path, 'gan_1'))
    assert len(loaded.history) == 2
    handler2 = _handler(2, 1, (10, 10, 1))
    loaded.train(handler2, input_resolution={'spatial': '30km',
                                             'temporal': '60min'},
                 n_epoch=2, out_dir=out_dir)
    assert len(loaded.history) == 4
    assert list(loaded.history.index) == [0, 1, 2, 3]
    assert os.path.exists(os.path.join(tmp_path, 'gan_3'))


def test_update_optimizer_preserves_state():
    """Changing the learning rate mid-training keeps Adam moments and
    rebuilds the step."""
    handler = _handler(2, 1, (10, 10, 1))
    model = Sup3rGan(_small_gen_s(), get_config('spatial/disc_test'),
                     learning_rate=1e-4)
    model.train(handler, input_resolution={'spatial': '30km',
                                           'temporal': '60min'},
                n_epoch=1, out_dir=None)
    opt_state_before = model._gen_opt_state
    model.update_optimizer(option='all', learning_rate=5e-5)
    assert model._optimizer_config['learning_rate'] == 5e-5
    assert model._optimizer_disc_config['learning_rate'] == 5e-5
    assert model._gen_opt_state is opt_state_before  # moments kept
    # training continues fine with the new optimizer
    handler2 = _handler(2, 1, (10, 10, 1))
    model.train(handler2, input_resolution={'spatial': '30km',
                                            'temporal': '60min'},
                n_epoch=1, out_dir=None)
    assert len(model.history) == 2


def test_bf16_inference_close_to_fp32():
    """Opt-in bfloat16 inference matches fp32 within bf16 epsilon."""
    model = Sup3rGan(_small_gen_s(), get_config('spatial/disc_test'))
    model.meta.update(lr_features=['u_100m', 'v_100m'],
                      hr_out_features=['u_100m', 'v_100m'],
                      input_resolution={'spatial': '30km',
                                        'temporal': '60min'})
    model.set_norm_stats({'u_100m': 0.1, 'v_100m': -0.2},
                         {'u_100m': 1.1, 'v_100m': 0.9})
    model.init_weights((1, 8, 8, 2), (1, 16, 16, 2))
    lr = np.random.default_rng(0).random((2, 8, 8, 2)).astype(np.float32)
    out32 = model.generate(lr)
    model.inference_dtype = 'bfloat16'
    out16 = model.generate(lr)
    assert out16.dtype == np.float32
    assert np.allclose(out16, out32, rtol=0.05, atol=0.05)
    assert not np.allclose(out16, out32, rtol=1e-7, atol=1e-8)
    model.inference_dtype = None
    np.testing.assert_allclose(model.generate(lr), out32, rtol=1e-6)


def test_train_fuse_matches_unfused():
    """Fused-train-step gradients match the plain network: one step
    from identical states produces (near-)identical params."""
    import jax

    from sup3r_tpu.configs import get_config

    def one_step(fuse):
        np.random.seed(0)
        gen_cfg = get_config('spatiotemporal/gen_3x_4x_2f')
        disc_cfg = get_config('spatiotemporal/disc_test')
        model = Sup3rGan(gen_cfg, disc_cfg, learning_rate=1e-3)
        model.train_fuse = fuse
        model.meta.update(lr_features=['u_100m', 'v_100m'],
                          hr_out_features=['u_100m', 'v_100m'],
                          input_resolution={'spatial': '12km',
                                            'temporal': '60min'})
        model.init_weights((1, 6, 6, 8, 2), (1, 18, 18, 32, 2))
        rng = np.random.default_rng(1)
        lr = rng.random((2, 6, 6, 8, 2)).astype(np.float32)
        hr = rng.random((2, 18, 18, 32, 2)).astype(np.float32)
        step = model.train_step_fn
        out = step(model.gen_params, model.disc_params,
                   model._gen_opt_state, model._disc_opt_state,
                   lr, hr, 1e-3, True, True, jax.random.PRNGKey(0))
        return out[0], out[4]

    p_fused, d_fused = one_step(True)
    p_plain, d_plain = one_step(False)
    np.testing.assert_allclose(float(d_fused['loss_gen']),
                               float(d_plain['loss_gen']), rtol=1e-5)
    # Adam's 1/sqrt(v) amplifies ulp-level backward-pass ordering
    # differences where v ~ 0, so allow a slightly looser atol
    for a, b in zip(jax_leaves(p_fused), jax_leaves(p_plain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def jax_leaves(tree):
    import jax

    return jax.tree.leaves(tree)


def test_train_remat_matches():
    """jax.checkpoint rematerialization changes memory, not math: one
    step with train_remat=True matches the default step."""
    import jax

    from sup3r_tpu.configs import get_config

    def one_step(remat):
        gen_cfg = _small_gen_st()
        disc_cfg = {'hidden_layers': [
            {'class': 'Conv3D', 'filters': 8, 'kernel_size': 3,
             'strides': 2, 'padding': 'same'},
            {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]}
        model = Sup3rGan(gen_cfg, disc_cfg, learning_rate=1e-3)
        model.train_remat = remat
        model.meta.update(lr_features=['u_100m', 'v_100m'],
                          hr_out_features=['u_100m', 'v_100m'],
                          input_resolution={'spatial': '12km',
                                            'temporal': '60min'})
        model.init_weights((1, 6, 6, 6, 2), (1, 12, 12, 12, 2))
        rng = np.random.default_rng(3)
        lr = rng.random((2, 6, 6, 6, 2)).astype(np.float32)
        hr = rng.random((2, 12, 12, 12, 2)).astype(np.float32)
        out = model.train_step_fn(
            model.gen_params, model.disc_params, model._gen_opt_state,
            model._disc_opt_state, lr, hr, 1e-3, True, True,
            jax.random.PRNGKey(0))
        return out[0], float(out[4]['loss_gen'])

    p1, l1 = one_step(False)
    p2, l2 = one_step(True)
    assert np.isclose(l1, l2, rtol=1e-6)
    for a, b in zip(jax_leaves(p1), jax_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_dropout_active_in_train_step():
    """A disc with Dropout behaves stochastically across PRNG keys in
    the train step but deterministically at eval (round-3 review
    finding: the keys were threaded but never passed, silently
    disabling dropout)."""
    import jax
    import jax.numpy as jnp

    gen = [{'class': 'Conv3D', 'filters': 2, 'kernel_size': 3,
            'strides': 1, 'padding': 'same'}]
    disc = [{'class': 'Conv3D', 'filters': 4, 'kernel_size': 3,
             'strides': 2, 'padding': 'same'},
            {'class': 'Dropout', 'rate': 0.5},
            {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]
    model = Sup3rGan(gen, disc, learning_rate=1e-4)
    model.init_weights((1, 6, 6, 4, 2), (1, 6, 6, 4, 2))
    loss_fn = model._make_disc_loss_fn()
    rng = np.random.default_rng(0)
    hr = jnp.asarray(rng.random((2, 6, 6, 4, 2)), jnp.float32)
    fake = jnp.asarray(rng.random((2, 6, 6, 4, 2)), jnp.float32)
    l1 = float(loss_fn(model.disc_params, hr, fake,
                       jax.random.PRNGKey(0)))
    l2 = float(loss_fn(model.disc_params, hr, fake,
                       jax.random.PRNGKey(1)))
    assert l1 != l2  # dropout masks differ across keys
    # eval path (no train flag) is deterministic
    e1 = np.asarray(model.discriminator.apply(model.disc_params, hr))
    e2 = np.asarray(model.discriminator.apply(model.disc_params, hr))
    np.testing.assert_array_equal(e1, e2)


def test_dropout_active_in_subclass_loss_fns():
    """SolarCC and Sup3rGanWithObs loss fns thread dropout keys like
    the base gan.py (round-3 review: the overrides dropped them,
    silently disabling dropout in those model families)."""
    import jax
    import jax.numpy as jnp

    from sup3r_tpu.models import SolarCC, Sup3rGanWithObs

    disc = [{'class': 'Conv3D', 'filters': 4, 'kernel_size': 3,
             'strides': 2, 'padding': 'same'},
            {'class': 'Dropout', 'rate': 0.5},
            {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]
    rng = np.random.default_rng(0)

    # SolarCC: hourly output, daylight-window losses
    gen = [{'class': 'Conv3D', 'filters': 1, 'kernel_size': 3,
            'strides': 1, 'padding': 'same'},
           {'class': 'SpatioTemporalExpansion', 'temporal_mult': 24}]
    sc = SolarCC(gen, disc, learning_rate=1e-4)
    sc.meta.update(lr_features=['clearsky_ratio'],
                   hr_out_features=['clearsky_ratio'])
    sc.init_weights((1, 4, 4, 1, 1), (1, 4, 4, 24, 1))
    lr = jnp.asarray(rng.random((1, 4, 4, 1, 1)), jnp.float32)
    hr = jnp.asarray(rng.random((1, 4, 4, 24, 1)), jnp.float32)
    loss_fn = sc._make_gen_loss_fn()
    l1 = float(loss_fn(sc.gen_params, sc.disc_params, lr, hr, 1e-3,
                       jax.random.PRNGKey(0))[0])
    l2 = float(loss_fn(sc.gen_params, sc.disc_params, lr, hr, 1e-3,
                       jax.random.PRNGKey(1))[0])
    assert l1 != l2
    d1 = float(sc._make_disc_loss_fn()(
        sc.disc_params, hr, hr + 0.1, jax.random.PRNGKey(2)))
    d2 = float(sc._make_disc_loss_fn()(
        sc.disc_params, hr, hr + 0.1, jax.random.PRNGKey(3)))
    assert d1 != d2

    # WithObs: obs-masked content loss. Fix the obs mask across keys
    # (spatial_frac bounds equal) so only dropout varies... the mask
    # also varies by key, which still proves the keys are threaded.
    gen_o = [{'class': 'Sup3rObsModel', 'name': 'u_100m_obs'},
             {'class': 'Conv3D', 'filters': 1, 'kernel_size': 3,
              'strides': 1, 'padding': 'same'}]
    ob = Sup3rGanWithObs(
        gen_o, disc, learning_rate=1e-4,
        onshore_obs_frac={'spatial_frac': 0.5})
    ob.meta.update(lr_features=['u_100m'],
                   hr_out_features=['u_100m'])
    ob.init_weights((1, 6, 6, 4, 1), (1, 6, 6, 4, 1))
    lr_o = jnp.asarray(rng.random((1, 6, 6, 4, 1)), jnp.float32)
    hr_o = jnp.asarray(rng.random((1, 6, 6, 4, 1)), jnp.float32)
    ofn = ob._make_gen_loss_fn()
    o1 = float(ofn(ob.gen_params, ob.disc_params, lr_o, hr_o, 1e-3,
                   jax.random.PRNGKey(0))[0])
    o2 = float(ofn(ob.gen_params, ob.disc_params, lr_o, hr_o, 1e-3,
                   jax.random.PRNGKey(1))[0])
    assert o1 != o2


def test_train_record_carries_across_epochs(tmp_path):
    """The loss record is a ROLLING last-n-batches window carried
    across epochs (reference: sup3r/models/abstract.py:590-623) — a
    per-epoch reset would cold-start the disc gating every epoch."""
    from sup3r_tpu.utilities.test_helpers import make_fake_dset

    from sup3r_tpu.preprocessing import BatchHandler

    data = make_fake_dset((12, 12, 20), ['u_100m', 'v_100m'])
    bh = BatchHandler([data], batch_size=2, n_batches=3,
                      s_enhance=2, t_enhance=1, sample_shape=(8, 8, 1),
                      queue_cap=2, means=None, stds=None, mode='eager')
    gen = [{'class': 'Conv2D', 'filters': 8, 'kernel_size': 3,
            'strides': 1, 'padding': 'same'},
           {'class': 'SpatialExpansion', 'spatial_mult': 2},
           {'class': 'Conv2D', 'filters': 2, 'kernel_size': 3,
            'strides': 1, 'padding': 'same'}]
    disc = [{'class': 'Conv2D', 'filters': 4, 'kernel_size': 3,
             'strides': 2, 'padding': 'same'},
            {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]
    model = Sup3rGan(gen, disc, learning_rate=1e-4)
    model.train(bh, input_resolution={'spatial': '12km',
                                      'temporal': '60min'},
                n_epoch=2, checkpoint_int=None,
                out_dir=str(tmp_path / 'gan_{epoch}'))
    # after 2 epochs x 3 batches, the rolling record holds the LAST
    # n_batches rows (not reset to just-this-epoch at epoch start)
    assert model._train_record is not None
    assert len(model._train_record) == 3


def test_tensorboard_logging_writes_events(tmp_path):
    """tensorboard_log=True writes per-epoch scalars to
    <out_dir>/../logs as TB event files (reference tf.summary
    equivalent; sup3r/models/utilities.py:77-145)."""
    from sup3r_tpu.utilities.test_helpers import make_fake_dset

    from sup3r_tpu.preprocessing import BatchHandler

    data = make_fake_dset((12, 12, 10), ['u_100m', 'v_100m'])
    bh = BatchHandler([data], batch_size=2, n_batches=2, s_enhance=2,
                      t_enhance=1, sample_shape=(8, 8, 1),
                      queue_cap=2, means=None, stds=None, mode='eager')
    gen = [{'class': 'Conv2D', 'filters': 8, 'kernel_size': 3,
            'strides': 1, 'padding': 'same'},
           {'class': 'SpatialExpansion', 'spatial_mult': 2},
           {'class': 'Conv2D', 'filters': 2, 'kernel_size': 3,
            'strides': 1, 'padding': 'same'}]
    disc = [{'class': 'Conv2D', 'filters': 4, 'kernel_size': 3,
             'strides': 2, 'padding': 'same'},
            {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]
    model = Sup3rGan(gen, disc, learning_rate=1e-4)
    out_dir = str(tmp_path / 'run' / 'gan_{epoch}')
    model.train(bh, input_resolution={'spatial': '12km',
                                      'temporal': '60min'},
                n_epoch=1, checkpoint_int=None, out_dir=out_dir,
                tensorboard_log=True)
    logs = list((tmp_path / 'run' / 'logs').glob(
        'events.out.tfevents.*'))
    assert logs, 'no TB event files written'
    assert logs[0].stat().st_size > 0


def test_sliced_wasserstein_resamples_inside_jitted_step():
    """SlicedWasserstein projections redraw PER TRAIN STEP inside the
    jitted step (reference redraws per call, loss_metrics.py:778):
    with learning_rate=0 (frozen params) the content loss still
    changes between steps on the SAME batch, while an MSE model's
    content loss stays bit-identical."""
    gen = [{'class': 'Conv2D', 'filters': 8, 'kernel_size': 3,
            'strides': 1, 'padding': 'same'},
           {'class': 'SpatialExpansion', 'spatial_mult': 2},
           {'class': 'Conv2D', 'filters': 2, 'kernel_size': 3,
            'strides': 1, 'padding': 'same'}]
    disc = [{'class': 'Conv2D', 'filters': 4, 'kernel_size': 3,
             'strides': 2, 'padding': 'same'},
            {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]
    rng = np.random.default_rng(0)
    lr = rng.random((2, 6, 6, 2)).astype(np.float32)
    hr = rng.random((2, 12, 12, 2)).astype(np.float32)

    swl = Sup3rGan(
        gen, disc, learning_rate=0.0,
        loss={'SlicedWassersteinLoss': {'n_projections': 16}})
    swl.init_weights(lr.shape, hr.shape)
    c1 = swl.run_gradient_descent(lr, hr)['loss_gen_content']
    c2 = swl.run_gradient_descent(lr, hr)['loss_gen_content']
    assert c1 != c2

    mse = Sup3rGan(gen, disc, learning_rate=0.0)
    mse.init_weights(lr.shape, hr.shape)
    m1 = mse.run_gradient_descent(lr, hr)['loss_gen_content']
    m2 = mse.run_gradient_descent(lr, hr)['loss_gen_content']
    assert m1 == m2
