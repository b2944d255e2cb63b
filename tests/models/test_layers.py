"""Layer DSL + Network interpreter behavior, incl. parity with the
reference's shipped JSON configs (loaded directly from /root/reference
when present)."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sup3r_tpu.configs import CONFIGS, get_config
from sup3r_tpu.models.layers import build_layers
from sup3r_tpu.models.network import Network

REF_CONFIG_DIR = '/root/reference/sup3r/configs'
KEY = jax.random.PRNGKey(0)


def test_basic_layer_shapes():
    net = Network([
        {'class': 'FlexiblePadding',
         'paddings': [[0, 0], [3, 3], [3, 3], [0, 0]], 'mode': 'REFLECT'},
        {'class': 'Conv2D', 'filters': 8, 'kernel_size': 3, 'strides': 1},
        {'class': 'Cropping2D', 'cropping': 2},
        {'class': 'LeakyReLU', 'alpha': 0.2},
    ])
    params, out_shape = net.init(KEY, (2, 10, 10, 3))
    assert out_shape == (2, 10, 10, 8)
    x = jnp.ones((2, 10, 10, 3))
    y = net.apply(params, x)
    assert y.shape == out_shape


def test_conv_transpose_grows_then_crop():
    net = Network([
        {'class': 'Conv2DTranspose', 'filters': 4, 'kernel_size': 3,
         'strides': 1},
        {'class': 'Cropping2D', 'cropping': 1},
    ])
    params, out_shape = net.init(KEY, (1, 6, 6, 2))
    assert out_shape == (1, 6, 6, 4)
    assert net.apply(params, jnp.ones((1, 6, 6, 2))).shape == out_shape


def test_spatial_expansion_pixel_shuffle():
    net = Network([{'class': 'SpatialExpansion', 'spatial_mult': 2}])
    params, out_shape = net.init(KEY, (1, 4, 4, 8))
    assert out_shape == (1, 8, 8, 2)
    x = jnp.arange(4 * 4 * 8, dtype=jnp.float32).reshape(1, 4, 4, 8)
    y = net.apply(params, x)
    assert y.shape == (1, 8, 8, 2)
    # TF depth_to_space ordering: out[0, 0, 1, 0] == in[0, 0, 0, 2]
    assert float(y[0, 0, 1, 0]) == float(x[0, 0, 0, 2])
    assert net.s_enhance == 2 and net.t_enhance == 1


def test_st_expansion_methods():
    x = jnp.asarray(
        np.random.default_rng(0).random((1, 2, 2, 3, 8)), jnp.float32)
    for method, t_mult, out_c in [('nearest', 4, 8), ('linear', 4, 8),
                                  ('depth_to_time', 4, 2)]:
        net = Network([{'class': 'SpatioTemporalExpansion',
                        'temporal_mult': t_mult,
                        'temporal_method': method}])
        p, shape = net.init(KEY, x.shape)
        assert shape == (1, 2, 2, 12, out_c), method
        assert net.apply(p, x).shape == shape
        assert net.t_enhance == 4

    # combined spatial + temporal
    net = Network([{'class': 'SpatioTemporalExpansion', 'spatial_mult': 2,
                    'temporal_mult': 2, 'temporal_method': 'nearest'}])
    p, shape = net.init(KEY, x.shape)
    assert shape == (1, 4, 4, 6, 2)


def test_depth_to_time_roll():
    x = jnp.arange(8, dtype=jnp.float32).reshape(1, 1, 1, 1, 8)
    net = Network([{'class': 'SpatioTemporalExpansion',
                    'temporal_mult': 8,
                    'temporal_method': 'depth_to_time', 't_roll': 4}])
    p, _ = net.init(KEY, x.shape)
    y = np.asarray(net.apply(p, x)).ravel()
    np.testing.assert_array_equal(y, np.roll(np.arange(8), 4))


def test_skip_connection_residual():
    net = Network([
        {'class': 'SkipConnection', 'name': 'a'},
        {'class': 'Activation', 'activation': 'relu'},
        {'class': 'SkipConnection', 'name': 'a'},
    ])
    p, _ = net.init(KEY, (1, 2, 2, 1))
    x = -jnp.ones((1, 2, 2, 1))
    # relu(-1) = 0, + skip(-1) = -1
    np.testing.assert_allclose(np.asarray(net.apply(p, x)), -1.0)


def test_unclosed_skip_raises():
    net = Network([{'class': 'SkipConnection', 'name': 'lonely'}])
    p, _ = net.init(KEY, (1, 2, 2, 1))
    with pytest.raises(ValueError, match='Unclosed skip'):
        net.apply(p, jnp.ones((1, 2, 2, 1)))


def test_exo_layers():
    net = Network([
        {'class': 'Sup3rConcat', 'name': 'topography'},
        {'class': 'Conv2D', 'filters': 2, 'kernel_size': 1},
    ])
    p, shape = net.init(KEY, (2, 4, 4, 3))
    assert shape == (2, 4, 4, 2)
    x = jnp.ones((2, 4, 4, 3))
    topo = jnp.ones((2, 4, 4, 1))
    assert net.apply(p, x, exo={'topography': topo}).shape == shape
    assert net.exo_features == ['topography']
    with pytest.raises(KeyError, match='topography'):
        net.apply(p, x, exo={})

    add = Network([{'class': 'Sup3rAdder', 'name': 'topography'}])
    pa, _ = add.init(KEY, (2, 4, 4, 1))
    y = add.apply(pa, x[..., :1], exo={'topography': topo})
    np.testing.assert_allclose(np.asarray(y), 2.0)


def test_obs_layers():
    net = Network([{'class': 'Sup3rConcatObs', 'name': 'obs_ws'}])
    p, shape = net.init(KEY, (1, 4, 4, 2))
    assert shape == (1, 4, 4, 4)
    obs = jnp.full((1, 4, 4, 1), jnp.nan).at[0, 0, 0, 0].set(3.0)
    y = net.apply(p, jnp.ones((1, 4, 4, 2)), exo={'obs_ws': obs})
    assert bool(jnp.isfinite(y).all())
    assert net.obs_features == ['obs_ws']


def test_repeat_expansion():
    layers = build_layers([{'n': 3, 'repeat': [
        {'class': 'Activation', 'activation': 'relu'}]}])
    assert len(layers) == 3


@pytest.mark.parametrize('name', sorted(CONFIGS))
def test_builtin_configs_build_and_shape(name):
    """Every built-in architecture initializes and has consistent static
    shape math."""
    cfg = get_config(name)
    net = Network(cfg['hidden_layers'])
    if 'disc' in name:
        if 'disc_test' in name:
            # 'same'-padding test discs accept small samples
            in_shape = ((2, 10, 10, 2) if not net.is_5d
                        else (2, 12, 12, 16, 2))
            params, out_shape = net.init(KEY, in_shape)
            assert out_shape == (2, 1)
        else:
            # production 'valid' pyramids need large samples; check the
            # static shape math only
            in_shape = ((2, 61, 61, 2) if not net.is_5d
                        else (2, 61, 61, 61, 2))
            assert net.out_shape(in_shape) == (2, 1)
        return
    s, t = net.s_enhance, net.t_enhance
    n_feat_out = net.out_shape(
        (1, 8, 8, 8, 3) if net.is_5d else (1, 8, 8, 3))[-1]
    in_shape = ((1, 6, 6, 4, n_feat_out + len(net.exo_features))
                if net.is_5d else
                (1, 6, 6, n_feat_out + len(net.exo_features)))
    params, out_shape = net.init(KEY, in_shape)
    if net.is_5d:
        assert out_shape[1:3] == (6 * s, 6 * s)
        assert out_shape[3] == 4 * t
    else:
        assert out_shape[1:3] == (6 * s, 6 * s)


@pytest.mark.skipif(not os.path.isdir(REF_CONFIG_DIR),
                    reason='reference configs not mounted')
@pytest.mark.parametrize('path', sorted(
    glob.glob(os.path.join(REF_CONFIG_DIR, '*', '*.json'))))
def test_reference_json_configs_load(path):
    """The interpreter must load every shipped reference JSON config and
    produce shape-consistent enhancement factors (SURVEY §2.2)."""
    net = Network(path)
    name = os.path.basename(path)
    if name.startswith('disc'):
        in_shape = ((2, 61, 61, 2) if not net.is_5d
                    else (2, 61, 61, 61, 2))
        assert net.out_shape(in_shape) == (2, 1)
        return
    if name.startswith('gen_') and 'x' in name:
        parts = name.replace('.json', '').split('_')
        mults = [p for p in parts if p.endswith('x')]
        if len(mults) == 2:
            s_exp, t_exp = int(mults[0][:-1]), int(mults[1][:-1])
            assert net.t_enhance == t_exp, path
            assert net.s_enhance == s_exp, path
        elif len(mults) == 1:
            assert net.s_enhance == int(mults[0][:-1]), path
    # init on a small input and check apply runs
    n_out = 2
    if name.startswith('gen_'):
        n_out = int(name.replace('.json', '').split('_')[-1][:-1])
    n_in = n_out + len(net.exo_features)
    in_shape = (1, 4, 4, 2, n_in) if net.is_5d else (1, 4, 4, n_in)
    params, out_shape = net.init(KEY, in_shape)
    exo = {f: jnp.ones((1, *out_shape[1:-1], 1))
           for f in net.exo_features}
    # exo rasters are injected at post-expansion resolution
    y = net.apply(params, jnp.ones(in_shape, jnp.float32), exo=exo)
    assert y.shape == out_shape
    assert y.shape[-1] == n_out


def test_dropout_layer_train_vs_inference():
    """Dropout zeros ~rate of activations (inverted scaling preserves
    the mean) in train mode with a key, and is an exact no-op at
    inference (reference layer DSL: phygnn Dropout in hidden_layers
    configs)."""
    net = Network([{'class': 'Dropout', 'rate': 0.5}])
    p, shape = net.init(KEY, (1, 32, 32, 4))
    assert shape == (1, 32, 32, 4)
    x = jnp.ones((1, 32, 32, 4))
    # inference (no key / train=False): identity
    np.testing.assert_array_equal(np.asarray(net.apply(p, x)),
                                  np.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(net.apply(p, x, train=True)), np.asarray(x))
    # train mode with a key: some zeros, survivors scaled by 1/keep
    y = np.asarray(net.apply(p, x, train=True, dropout_key=KEY))
    dropped = float((y == 0).mean())
    assert 0.3 < dropped < 0.7
    assert np.allclose(y[y != 0], 2.0)
    assert abs(y.mean() - 1.0) < 0.1  # inverted dropout keeps E[x]


def test_sup3r_obs_model_layer():
    """Sup3rObsModel learns a (obs, mask) -> channels projection added
    to the activation; NaN holes in the obs never reach the output
    (reference: sup3r custom obs-fusion layers,
    models/with_obs.py usage)."""
    net = Network([{'class': 'Sup3rObsModel', 'name': 'u_obs'}])
    p, shape = net.init(KEY, (1, 4, 4, 3))
    assert shape == (1, 4, 4, 3)  # additive: channel count unchanged
    assert net.obs_features == ['u_obs']
    obs = jnp.full((1, 4, 4, 1), jnp.nan).at[0, 1, 2, 0].set(5.0)
    x = jnp.ones((1, 4, 4, 3))
    y = np.asarray(net.apply(p, x, exo={'u_obs': obs}))
    assert np.isfinite(y).all()
    # unobserved cells still shift by the mask-channel projection;
    # the observed cell must differ from unobserved ones
    assert not np.allclose(y[0, 1, 2], y[0, 0, 0])
    # missing exo is loud
    with pytest.raises(KeyError, match='u_obs'):
        net.apply(p, x, exo={})


def test_generate_normalizes_layer_exo():
    """Mid-network exo rasters are normalized with their own feature
    stats at inference (reference: sup3r/models/abstract.py:981
    run_exo_layer -> _reshape_norm_exo) — training concatenates
    normalized exo channels, so raw-physical topography at the concat
    layer would shift every downstream activation (round-3 review
    finding, masked by tests using mean-0/std-1 stats)."""
    import numpy as np

    from sup3r_tpu.models import Sup3rGan

    gen = [
        {'class': 'Conv2D', 'filters': 8, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
        {'class': 'Sup3rConcat', 'name': 'topography'},
        {'class': 'Conv2D', 'filters': 2, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
    ]
    disc = [{'class': 'Conv2D', 'filters': 4, 'kernel_size': 3,
             'strides': 2, 'padding': 'same'},
            {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]
    rng = np.random.default_rng(0)
    lr = rng.random((2, 6, 6, 2)).astype(np.float32)
    topo_norm = rng.random((6, 6, 1)).astype(np.float32)

    def build(topo_mean, topo_std):
        m = Sup3rGan(gen, disc)
        m.meta.update(lr_features=['u_100m', 'v_100m'],
                      hr_out_features=['u_100m', 'v_100m'],
                      s_enhance=1, t_enhance=1)
        means = {'u_100m': 0.0, 'v_100m': 0.0,
                 'topography': topo_mean}
        stds = {'u_100m': 1.0, 'v_100m': 1.0, 'topography': topo_std}
        m.set_norm_stats(means, stds)
        m.init_weights((1, 6, 6, 2), (1, 6, 6, 2), seed=7)
        return m

    m_unit = build(0.0, 1.0)
    m_phys = build(1000.0, 500.0)
    out_unit = m_unit.generate(
        lr, exogenous_data={'topography': topo_norm})
    out_phys = m_phys.generate(
        lr, exogenous_data={'topography': 1000.0 + 500.0 * topo_norm})
    np.testing.assert_allclose(out_phys, out_unit, rtol=1e-4,
                               atol=1e-5)
