"""Numerical parity vs TensorFlow (the reference's compute substrate):
same weights through TF ops and through our JAX layer DSL must match to
rtol 1e-4 (the BASELINE.md north-star tolerance).

Covers the layers the shipped generator configs use: Conv2D/3D
(valid/same), Conv2DTranspose, reflect padding, cropping, LeakyReLU,
depth_to_space pixel shuffles, and a full ST resblock generator.
"""

import numpy as np
import pytest

tf = pytest.importorskip('tensorflow')

import jax.numpy as jnp  # noqa: E402

from sup3r_tpu.models.network import Network  # noqa: E402

RNG = np.random.default_rng(42)
ATOL = 1e-4
RTOL = 1e-4


def _assert_close(jax_out, tf_out):
    np.testing.assert_allclose(np.asarray(jax_out), tf_out.numpy(),
                               rtol=RTOL, atol=ATOL)


def _net_with_weights(config, weights):
    """Build a Network and inject the given kernels/biases."""
    net = Network(config)
    import jax

    params, _ = net.init(jax.random.PRNGKey(0), weights['in_shape'])
    for idx, (k, b) in weights['params'].items():
        params[idx] = {'kernel': jnp.asarray(k), 'bias': jnp.asarray(b)}
    return net, params


def test_conv2d_parity():
    x = RNG.standard_normal((2, 10, 10, 3)).astype(np.float32)
    k = (RNG.standard_normal((3, 3, 3, 8)) * 0.1).astype(np.float32)
    b = RNG.standard_normal(8).astype(np.float32)
    for padding in ('VALID', 'SAME'):
        tf_out = tf.nn.conv2d(x, k, 1, padding) + b
        net, params = _net_with_weights(
            [{'class': 'Conv2D', 'filters': 8, 'kernel_size': 3,
              'strides': 1, 'padding': padding.lower()}],
            {'in_shape': x.shape, 'params': {0: (k, b)}})
        _assert_close(net.apply(params, jnp.asarray(x)), tf_out)


def test_conv3d_strided_parity():
    x = RNG.standard_normal((1, 8, 8, 8, 4)).astype(np.float32)
    k = (RNG.standard_normal((3, 3, 3, 4, 6)) * 0.1).astype(np.float32)
    b = RNG.standard_normal(6).astype(np.float32)
    for strides, padding in [(1, 'VALID'), (2, 'SAME')]:
        tf_out = tf.nn.conv3d(x, k, [1, strides, strides, strides, 1],
                              padding) + b
        net, params = _net_with_weights(
            [{'class': 'Conv3D', 'filters': 6, 'kernel_size': 3,
              'strides': strides, 'padding': padding.lower()}],
            {'in_shape': x.shape, 'params': {0: (k, b)}})
        _assert_close(net.apply(params, jnp.asarray(x)), tf_out)


def test_conv2d_transpose_parity():
    x = RNG.standard_normal((2, 6, 6, 4)).astype(np.float32)
    # tf filter layout: (h, w, OUT, IN); ours: (h, w, IN, OUT)
    k_tf = (RNG.standard_normal((3, 3, 8, 4)) * 0.1).astype(np.float32)
    b = RNG.standard_normal(8).astype(np.float32)
    tf_out = tf.nn.conv2d_transpose(
        x, k_tf, output_shape=(2, 8, 8, 8), strides=1,
        padding='VALID') + b
    # TF convT == lax.conv_transpose with spatially-flipped kernel +
    # io transpose (weight-porting recipe for TF-trained models)
    k_jax = np.flip(np.transpose(k_tf, (0, 1, 3, 2)), (0, 1))
    net, params = _net_with_weights(
        [{'class': 'Conv2DTranspose', 'filters': 8, 'kernel_size': 3,
          'strides': 1}],
        {'in_shape': x.shape, 'params': {0: (k_jax, b)}})
    _assert_close(net.apply(params, jnp.asarray(x)), tf_out)


def test_reflect_pad_crop_lrelu_parity():
    x = RNG.standard_normal((2, 6, 6, 3)).astype(np.float32)
    tf_out = tf.pad(x, [[0, 0], [3, 3], [3, 3], [0, 0]],
                    mode='REFLECT')
    tf_out = tf_out[:, 2:-2, 2:-2, :]
    tf_out = tf.nn.leaky_relu(tf_out, 0.2)
    net, params = _net_with_weights(
        [{'class': 'FlexiblePadding',
          'paddings': [[0, 0], [3, 3], [3, 3], [0, 0]],
          'mode': 'REFLECT'},
         {'class': 'Cropping2D', 'cropping': 2},
         {'class': 'LeakyReLU', 'alpha': 0.2}],
        {'in_shape': x.shape, 'params': {}})
    _assert_close(net.apply(params, jnp.asarray(x)), tf_out)


def test_depth_to_space_parity():
    x = RNG.standard_normal((2, 4, 4, 8)).astype(np.float32)
    tf_out = tf.nn.depth_to_space(x, 2)
    net, params = _net_with_weights(
        [{'class': 'SpatialExpansion', 'spatial_mult': 2}],
        {'in_shape': x.shape, 'params': {}})
    _assert_close(net.apply(params, jnp.asarray(x)), tf_out)


def test_full_st_generator_parity():
    """A reflect-conv resblock ST generator with temporal + spatial
    expansion: identical weights through TF ops and our Network."""
    c_in, c_mid, n_out = 2, 8, 2
    s_mult, t_mult = 2, 2
    x = RNG.standard_normal((1, 6, 6, 4, c_in)).astype(np.float32)

    kernels = {
        'k0': (RNG.standard_normal((3, 3, 3, c_in, c_mid)) * 0.1
               ).astype(np.float32),
        'k1': (RNG.standard_normal((3, 3, 3, c_mid, c_mid)) * 0.1
               ).astype(np.float32),
        'k2': (RNG.standard_normal((3, 3, 3, c_mid, c_mid)) * 0.1
               ).astype(np.float32),
        'k3': (RNG.standard_normal(
            (3, 3, 3, c_mid, c_mid * s_mult * s_mult)) * 0.1
            ).astype(np.float32),
        'k4': (RNG.standard_normal((3, 3, 3, c_mid, n_out)) * 0.1
               ).astype(np.float32),
    }
    biases = {f'b{i}': RNG.standard_normal(
        kernels[f'k{i}'].shape[-1]).astype(np.float32)
        for i in range(5)}

    def tf_resunit(z, k, b):
        z = tf.pad(z, [[0, 0], [3, 3], [3, 3], [3, 3], [0, 0]],
                   mode='REFLECT')
        z = tf.nn.conv3d(z, k, [1] * 5, 'VALID') + b
        return z[:, 2:-2, 2:-2, 2:-2, :]

    # TF forward
    z = tf_resunit(x, kernels['k0'], biases['b0'])
    z = tf.nn.leaky_relu(z, 0.2)
    z = tf.repeat(z, t_mult, axis=3)
    skip = z
    z = tf_resunit(z, kernels['k1'], biases['b1'])
    z = tf.nn.leaky_relu(z, 0.2)
    z = tf_resunit(z, kernels['k2'], biases['b2'])
    z = z + skip
    z = tf_resunit(z, kernels['k3'], biases['b3'])
    # spatial pixel shuffle per frame (tf depth_to_space)
    b_, h, w, t, c = z.shape
    zz = tf.transpose(z, (0, 3, 1, 2, 4))
    zz = tf.reshape(zz, (-1, h, w, c))
    zz = tf.nn.depth_to_space(zz, s_mult)
    zz = tf.reshape(zz, (-1, t, h * s_mult, w * s_mult,
                         c // s_mult ** 2))
    z = tf.transpose(zz, (0, 2, 3, 1, 4))
    z = tf.nn.leaky_relu(z, 0.2)
    tf_out = tf_resunit(z, kernels['k4'], biases['b4'])

    # our Network with the same weights
    pad = {'class': 'FlexiblePadding',
           'paddings': [[0, 0], [3, 3], [3, 3], [3, 3], [0, 0]],
           'mode': 'REFLECT'}
    config = [
        dict(pad),
        {'class': 'Conv3D', 'filters': c_mid, 'kernel_size': 3,
         'strides': 1},
        {'class': 'Cropping3D', 'cropping': 2},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'SpatioTemporalExpansion', 'temporal_mult': t_mult,
         'temporal_method': 'nearest'},
        {'class': 'SkipConnection', 'name': 'a'},
        dict(pad),
        {'class': 'Conv3D', 'filters': c_mid, 'kernel_size': 3,
         'strides': 1},
        {'class': 'Cropping3D', 'cropping': 2},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        dict(pad),
        {'class': 'Conv3D', 'filters': c_mid, 'kernel_size': 3,
         'strides': 1},
        {'class': 'Cropping3D', 'cropping': 2},
        {'class': 'SkipConnection', 'name': 'a'},
        dict(pad),
        {'class': 'Conv3D', 'filters': c_mid * s_mult * s_mult,
         'kernel_size': 3, 'strides': 1},
        {'class': 'Cropping3D', 'cropping': 2},
        {'class': 'SpatioTemporalExpansion', 'spatial_mult': s_mult},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        dict(pad),
        {'class': 'Conv3D', 'filters': n_out, 'kernel_size': 3,
         'strides': 1},
        {'class': 'Cropping3D', 'cropping': 2},
    ]
    conv_idx = [1, 7, 11, 15, 20]
    weights = {'in_shape': x.shape, 'params': {
        idx: (kernels[f'k{i}'], biases[f'b{i}'])
        for i, idx in enumerate(conv_idx)}}
    net, params = _net_with_weights(config, weights)
    out = net.apply(params, jnp.asarray(x))
    assert out.shape == tuple(tf_out.shape)
    _assert_close(out, tf_out)
