"""Network fusion pass: fused reflect-conv blocks must be numerically
identical to the pad/conv/crop/act composition (CPU fallback path; the
Pallas path is validated on TPU by scripts/bench_kernels.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sup3r_tpu.models.fuse import FusedReflectConv, fuse_network
from sup3r_tpu.models.network import Network

KEY = jax.random.PRNGKey(0)
RNG = np.random.default_rng(3)


def _st_config():
    pad = {'class': 'FlexiblePadding',
           'paddings': [[0, 0], [3, 3], [3, 3], [3, 3], [0, 0]],
           'mode': 'REFLECT'}
    return [
        dict(pad),
        {'class': 'Conv3D', 'filters': 16, 'kernel_size': 3,
         'strides': 1},
        {'class': 'Cropping3D', 'cropping': 2},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'SkipConnection', 'name': 'a'},
        dict(pad),
        {'class': 'Conv3D', 'filters': 16, 'kernel_size': 3,
         'strides': 1},
        {'class': 'Cropping3D', 'cropping': 2},
        {'class': 'SkipConnection', 'name': 'a'},
        dict(pad),
        {'class': 'Conv3D', 'filters': 2, 'kernel_size': 3,
         'strides': 1},
        {'class': 'Cropping3D', 'cropping': 2},
    ]


def _spatial_config():
    pad = {'class': 'FlexiblePadding',
           'paddings': [[0, 0], [3, 3], [3, 3], [0, 0]],
           'mode': 'REFLECT'}
    return [
        dict(pad),
        {'class': 'Conv2DTranspose', 'filters': 16, 'kernel_size': 3,
         'strides': 1, 'activation': 'relu'},
        {'class': 'Cropping2D', 'cropping': 4},
        dict(pad),
        {'class': 'Conv2DTranspose', 'filters': 2, 'kernel_size': 3,
         'strides': 1, 'activation': None},
        {'class': 'Cropping2D', 'cropping': 4},
    ]


def test_fuse_st_network_matches_unfused():
    net = Network(_st_config())
    params, _ = net.init(KEY, (2, 8, 8, 6, 2))
    x = jnp.asarray(RNG.standard_normal((2, 8, 8, 6, 2)), jnp.float32)
    expected = net.apply(params, x)
    layers, fparams = fuse_network(net.layers, params)
    # 3 fused blocks (+1 trailing lrelu consumed into block 1) + 2 skips
    assert sum(isinstance(l, FusedReflectConv) for l in layers) == 3
    assert len(layers) == 5
    fused = Network(layers)
    out = fused.apply(fparams, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               atol=1e-5)


def test_fuse_conv_transpose_matches_unfused():
    """ConvT fusion uses the spatially flipped kernel."""
    net = Network(_spatial_config())
    params, _ = net.init(KEY, (2, 10, 10, 2))
    x = jnp.asarray(RNG.standard_normal((2, 10, 10, 2)), jnp.float32)
    expected = net.apply(params, x)
    layers, fparams = fuse_network(net.layers, params)
    assert sum(isinstance(l, FusedReflectConv) for l in layers) == 2
    out = Network(layers).apply(fparams, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               atol=1e-5)


def test_fuse_ignores_non_matching():
    cfg = [
        {'class': 'Conv2D', 'filters': 4, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
        {'class': 'LeakyReLU', 'alpha': 0.2},
    ]
    net = Network(cfg)
    params, _ = net.init(KEY, (1, 8, 8, 2))
    layers, fparams = fuse_network(net.layers, params)
    assert len(layers) == 2
    assert not any(isinstance(l, FusedReflectConv) for l in layers)


def test_gan_generate_fused_matches_unfused():
    from sup3r_tpu.models import Sup3rGan

    gen = _st_config()
    disc = [{'class': 'Conv3D', 'filters': 4, 'kernel_size': 3,
             'strides': 2, 'padding': 'same'},
            {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]
    model = Sup3rGan(gen, disc)
    model.meta.update(lr_features=['u_100m', 'v_100m'],
                      hr_out_features=['u_100m', 'v_100m'],
                      s_enhance=1, t_enhance=1)
    model.init_weights((1, 8, 8, 4, 2), (1, 8, 8, 4, 2))
    lr = RNG.standard_normal((1, 8, 8, 4, 2)).astype(np.float32)
    model.inference_fuse = False
    out_plain = model.generate(lr)
    model.inference_fuse = True
    out_fused = model.generate(lr)
    np.testing.assert_allclose(out_fused, out_plain, atol=1e-5)


def test_small_conv_kernel_grads_match_reference():
    """The small-channel Pallas conv's custom VJP (interpret mode)
    matches the XLA reference conv's gradients."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from sup3r_tpu.ops import pallas_kernels as pk

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw['interpret'] = True
        kw.pop('compiler_params', None)
        return orig(*a, **kw)

    pl.pallas_call = interp
    try:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((2, 6, 5, 8, 3)), jnp.float32)
        k = jnp.asarray(rng.random((3, 3, 3, 3, 2)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.random((2,)), jnp.float32)

        def loss(fn):
            return lambda x, k, b: jnp.sum(fn(x, k, b, alpha=0.2) ** 2)

        g1 = jax.grad(loss(pk.small_reflect_conv),
                      argnums=(0, 1, 2))(x, k, b)
        g2 = jax.grad(loss(pk.reflect_conv_reference),
                      argnums=(0, 1, 2))(x, k, b)
        for a, bb in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       rtol=1e-4, atol=1e-5)
        # forward equivalence too
        o1 = pk.small_reflect_conv(x, k, b, alpha=0.2)
        o2 = pk.reflect_conv_reference(x, k, b, alpha=0.2)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   rtol=1e-5, atol=1e-6)
    finally:
        pl.pallas_call = orig


def _expansion_tail_config(temporal_method=None):
    """Flagship-style ending: conv -> expansion -> LeakyReLU -> conv."""
    pad = {'class': 'FlexiblePadding',
           'paddings': [[0, 0], [3, 3], [3, 3], [3, 3], [0, 0]],
           'mode': 'REFLECT'}
    exp = {'class': 'SpatioTemporalExpansion', 'spatial_mult': 2}
    if temporal_method is not None:
        exp.update(temporal_mult=2, temporal_method=temporal_method)
    return [
        dict(pad),
        {'class': 'Conv3D', 'filters': 8, 'kernel_size': 3,
         'strides': 1},
        {'class': 'Cropping3D', 'cropping': 2},
        exp,
        {'class': 'LeakyReLU', 'alpha': 0.2},
        dict(pad),
        {'class': 'Conv3D', 'filters': 2, 'kernel_size': 3,
         'strides': 1},
        {'class': 'Cropping3D', 'cropping': 2},
    ]


@pytest.mark.parametrize('temporal_method',
                         [None, 'nearest', 'depth_to_time'])
def test_fold_activation_across_movement_expansion(temporal_method):
    """conv -> pixel-shuffle/repeat expansion -> LeakyReLU folds the
    activation into the fused conv's epilogue (it commutes exactly
    across pure data movement/duplication), removing a standalone
    HBM-bound activation pass at the post-expansion resolution."""
    from sup3r_tpu.models.layers import LeakyReLU

    net = Network(_expansion_tail_config(temporal_method))
    params, _ = net.init(KEY, (2, 6, 6, 4, 2))
    x = jnp.asarray(RNG.standard_normal((2, 6, 6, 4, 2)), jnp.float32)
    expected = net.apply(params, x)
    layers, fparams = fuse_network(net.layers, params)
    assert not any(isinstance(l, LeakyReLU) for l in layers), layers
    assert layers[0].alpha == pytest.approx(0.2)
    out = Network(layers).apply(fparams, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               atol=1e-6)


def test_no_fold_across_interpolating_expansion():
    """'linear' temporal interpolation AVERAGES values, so the
    activation must NOT move across it."""
    from sup3r_tpu.models.layers import LeakyReLU

    net = Network(_expansion_tail_config('linear'))
    params, _ = net.init(KEY, (2, 6, 6, 4, 2))
    x = jnp.asarray(RNG.standard_normal((2, 6, 6, 4, 2)), jnp.float32)
    expected = net.apply(params, x)
    layers, fparams = fuse_network(net.layers, params)
    assert any(isinstance(l, LeakyReLU) for l in layers), layers
    assert layers[0].alpha is None
    out = Network(layers).apply(fparams, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               atol=1e-6)
