"""Model-family regressions from the round-4 self-review: WithObs
validation exo, optimizer kwargs passthrough, explicit re-seeding,
MultiStepGan kwargs broadcast, Sup3rObsModel filters, unknown layer
config keys, and device-transform cache invalidation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sup3r_tpu.models import Sup3rGan, Sup3rGanWithObs
from sup3r_tpu.models.gan import _make_optimizer

FEATURES = ['u_100m', 'v_100m']


def _gen_layers(obs=False, expand=2):
    layers = [
        {'class': 'Conv2D', 'filters': 16, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
        {'class': 'SpatialExpansion', 'spatial_mult': expand},
        {'class': 'LeakyReLU', 'alpha': 0.2},
    ]
    if obs:
        layers.append({'class': 'Sup3rConcatObs', 'name': 'u_100m_obs'})
    layers.append({'class': 'Conv2D', 'filters': 2, 'kernel_size': 3,
                   'strides': 1, 'padding': 'same'})
    return layers


DISC = [{'class': 'Conv2D', 'filters': 4, 'kernel_size': 3,
         'strides': 2, 'padding': 'same'},
        {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]


def _setup(model):
    model.meta.update(lr_features=FEATURES, hr_out_features=FEATURES,
                      s_enhance=2, t_enhance=1,
                      input_resolution={'spatial': '12km',
                                        'temporal': '60min'})
    model.set_norm_stats({f: 0.0 for f in FEATURES},
                         {f: 1.0 for f in FEATURES})
    model.init_weights((1, 6, 6, 2), (1, 12, 12, 2))
    return model


class _FakeValHandler:
    """Minimal val-only handler: iterable of (low_res, high_res)."""

    class _B:
        def __init__(self, lr, hr):
            self.low_res, self.high_res = lr, hr

    def __init__(self, n=2):
        rng = np.random.default_rng(0)
        self.val_data = [
            self._B(rng.random((2, 6, 6, 2), np.float32),
                    rng.random((2, 12, 12, 2), np.float32))
            for _ in range(n)]


def test_withobs_validation_does_not_keyerror():
    """calc_val_loss on an observation model must inject masked obs
    exo like the training path (round-4 review finding: KeyError on
    the first validation batch of any real WithObs training run)."""
    model = _setup(Sup3rGanWithObs(
        _gen_layers(obs=True), DISC,
        onshore_obs_frac={'spatial_frac': 0.2}))
    out = model.calc_val_loss(_FakeValHandler(), 1e-3)
    assert set(out) >= {'val_loss_gen', 'val_loss_disc'}
    assert np.isfinite(list(out.values())).all()


def test_plain_gan_val_loss_matches_jitted_path():
    """The jitted val step reports the same losses as a direct
    (unjitted) calc_loss evaluation."""
    model = _setup(Sup3rGan(_gen_layers(), DISC))
    handler = _FakeValHandler(n=1)
    out = model.calc_val_loss(handler, 1e-3)
    b = handler.val_data[0]
    direct = model.calc_loss(
        jnp.asarray(b.high_res),
        model._get_gen_apply()(model.gen_params,
                               jnp.asarray(b.low_res), {}),
        weight_gen_advers=1e-3, train_gen=True, compute_disc=True)[1]
    for k, v in direct.items():
        np.testing.assert_allclose(out[f'val_{k}'], float(v),
                                   rtol=1e-5, err_msg=k)


def test_optimizer_kwargs_passthrough():
    """SGD momentum / AdamW weight_decay must reach optax (they were
    silently dropped — round-4 review finding)."""
    _, cfg = _make_optimizer({'name': 'SGD', 'learning_rate': 0.01,
                              'momentum': 0.9})
    assert cfg['momentum'] == 0.9
    _, cfg = _make_optimizer({'name': 'AdamW', 'learning_rate': 1e-4,
                              'weight_decay': 0.05})
    assert cfg['weight_decay'] == 0.05
    _, cfg = _make_optimizer({'name': 'Adam', 'learning_rate': 1e-4,
                              'beta_1': 0.5, 'epsilon': 1e-6})
    assert cfg['b1'] == 0.5 and cfg['eps'] == 1e-6


def test_init_weights_explicit_seed_redraws():
    """An explicit seed re-initializes; the idempotence guard only
    covers seedless shape-setup calls."""
    def kernel(m):
        # first multi-dim leaf (leaf 0 is a zero bias)
        return next(np.asarray(w) for w in jax.tree.leaves(
            m.gen_params) if np.ndim(w) > 1).copy()

    model = _setup(Sup3rGan(_gen_layers(), DISC))
    w0 = kernel(model)
    model.init_weights((1, 6, 6, 2), (1, 12, 12, 2))  # no seed: keep
    np.testing.assert_array_equal(kernel(model), w0)
    model.init_weights((1, 6, 6, 2), (1, 12, 12, 2), seed=7)
    w7 = kernel(model)
    assert not np.array_equal(w7, w0)
    model.init_weights((1, 6, 6, 2), (1, 12, 12, 2), seed=7)
    np.testing.assert_array_equal(kernel(model), w7)  # reproducible


def test_multistep_dict_kwargs_broadcast(tmp_path):
    """One model_kwargs dict must apply to EVERY step (zip truncation
    silently loaded a 1-model chain — round-4 review finding)."""
    from sup3r_tpu.models import MultiStepGan

    dirs = []
    for i in range(2):
        m = _setup(Sup3rGan(_gen_layers(), DISC))
        d = str(tmp_path / f'step{i}')
        m.save(d)
        dirs.append(d)
    chain = MultiStepGan.load(dirs, model_kwargs={'verbose': False})
    assert len(chain) == 2
    with pytest.raises(ValueError, match='model_kwargs'):
        MultiStepGan.load(dirs, model_kwargs=[{}])


def test_obs_model_filters_hidden_width():
    """Sup3rObsModel(filters=N) builds a two-stage projection back to
    the activation channel count (the single-kernel form crashed for
    any filters != channels — round-4 review finding)."""
    from sup3r_tpu.models.layers import Sup3rObsModel

    layer = Sup3rObsModel(name='u_100m_obs', filters=8)
    params, out_shape = layer.init(jax.random.PRNGKey(0),
                                   (1, 12, 12, 16))
    assert out_shape == (1, 12, 12, 16)
    assert params['kernel'].shape == (2, 8)
    assert params['kernel_out'].shape == (8, 16)
    x = jnp.ones((1, 12, 12, 16))
    obs = jnp.full((1, 12, 12, 1), jnp.nan).at[0, 3, 4, 0].set(1.5)
    y = layer.apply(params, x, {'exo': {'u_100m_obs': obs}})
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_unknown_layer_config_keys_warn(caplog):
    """Misspelled/unsupported layer options must warn at build time,
    not silently build a different network."""
    import logging

    from sup3r_tpu.models.layers import build_layers

    with caplog.at_level(logging.WARNING):
        build_layers([{'class': 'LeakyReLU', 'aplha': 0.1}])
    assert any('aplha' in r.message for r in caplog.records)


def test_sample_transform_change_invalidates_jit():
    """Changing the device-transform config must drop the cached
    jitted sample step (same-shaped samples would never retrace)."""
    model = _setup(Sup3rGan(_gen_layers(), DISC))
    cfg_a = {'s_enhance': 2, 't_enhance': 1, 'method': 'subsample',
             'hr_features_ind': (0, 1), 'squeeze_time': True}
    model._sample_transform = cfg_a
    fn1 = model.sample_train_step_fn
    model._sample_transform = dict(cfg_a)  # equal config: keep cache
    assert model.sample_train_step_fn is fn1
    cfg_b = dict(cfg_a, method='average')
    model._sample_transform = cfg_b
    assert model._sample_step_fn is None


def test_old_single_stage_obs_checkpoint_errors_clearly(tmp_path):
    """Checkpoints saved by the earlier single-kernel
    Sup3rObsModel(filters=...) form must fail to restore with a
    message naming the layer-format change, not an opaque
    flax/msgpack key error (round-4 review finding)."""
    from sup3r_tpu.models.abstract import AbstractSingleModel
    from sup3r_tpu.models.network import Network

    config = [
        {'class': 'Sup3rObsModel', 'name': 'u_100m_obs', 'filters': 8},
    ]
    net = Network(config)
    template, _ = net.init(jax.random.PRNGKey(0), (1, 6, 6, 4))
    # the pre-round-4 layout: one (2, c) kernel straight to channels
    old = list(template)
    old[0] = {'kernel': np.zeros((2, 4), np.float32),
              'bias': np.zeros(4, np.float32)}
    fp = str(tmp_path / 'gen.msgpack')
    AbstractSingleModel.save_network_params(old, fp)
    with pytest.raises(ValueError, match='Sup3rObsModel'):
        AbstractSingleModel.load_network_params(template, fp)


def test_import_phygnn_refuses_two_stage_obs_layer():
    """import_phygnn_network must refuse (not silently randomize)
    the two-stage obs projection — phygnn's weight layout for
    filters-enabled Sup3rObsModel is not mapped."""
    from sup3r_tpu.utilities.port import import_phygnn_network

    config = [
        {'class': 'Sup3rObsModel', 'name': 'u_100m_obs', 'filters': 8},
    ]
    weights = [np.zeros((2, 8), np.float32), np.zeros(8, np.float32)]
    with pytest.raises(NotImplementedError, match='two-stage'):
        import_phygnn_network(config, weights, (1, 6, 6, 4))
