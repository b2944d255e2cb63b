"""Custom-VJP reflect-conv block (ops/conv_ad.py): forward must be
bit-identical to the jnp.pad reference and gradients must match plain
XLA autodiff to float tolerance, for 2D and 3D, with and without the
fused LeakyReLU, including the reflect-fold corner terms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sup3r_tpu.ops.conv_ad import reflect_conv_ad
from sup3r_tpu.ops.pallas_kernels import reflect_conv_reference

RNG = np.random.default_rng(0)


def _data(n_spatial, spatial, ci=5, co=7, batch=2):
    x = RNG.standard_normal((batch, *spatial, ci)).astype(np.float32)
    k = RNG.standard_normal(
        (*(3,) * n_spatial, ci, co)).astype(np.float32) * 0.2
    b = RNG.standard_normal(co).astype(np.float32) * 0.1
    return jnp.asarray(x), jnp.asarray(k), jnp.asarray(b)


@pytest.mark.parametrize('n_spatial,spatial', [
    (2, (6, 7)), (3, (5, 6, 7)), (3, (4, 4, 4))])
@pytest.mark.parametrize('alpha', [None, 0.2, 0.0])
def test_forward_bit_identical(n_spatial, spatial, alpha):
    x, k, b = _data(n_spatial, spatial)
    got = reflect_conv_ad(x, k, b, n_spatial, alpha)
    ref = reflect_conv_reference(x, k, b, alpha=alpha)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize('n_spatial,spatial', [
    (2, (6, 7)), (3, (5, 6, 7)), (3, (4, 4, 4))])
@pytest.mark.parametrize('alpha', [None, 0.2])
def test_gradients_match_autodiff(n_spatial, spatial, alpha):
    x, k, b = _data(n_spatial, spatial)
    cot = jnp.asarray(RNG.standard_normal(
        reflect_conv_ad(x, k, b, n_spatial, alpha).shape
    ).astype(np.float32))

    def loss_custom(x, k, b):
        return jnp.sum(reflect_conv_ad(x, k, b, n_spatial, alpha)
                       * cot)

    def loss_auto(x, k, b):
        return jnp.sum(reflect_conv_reference(x, k, b, alpha=alpha)
                       * cot)

    gc = jax.grad(loss_custom, argnums=(0, 1, 2))(x, k, b)
    ga = jax.grad(loss_auto, argnums=(0, 1, 2))(x, k, b)
    for name, a, c in zip(('dx', 'dk', 'db'), ga, gc):
        np.testing.assert_allclose(
            np.asarray(c), np.asarray(a), rtol=2e-5, atol=2e-5,
            err_msg=name)


def test_corner_fold_exact_small():
    """3x3 input: every cell of the padded grad folds somewhere,
    corners twice — compare against autodiff on the tiniest case
    where corner handling dominates."""
    x, k, b = _data(2, (3, 3), ci=1, co=1, batch=1)

    def f_c(x):
        return jnp.sum(reflect_conv_ad(x, k, b, 2, None) ** 2)

    def f_a(x):
        return jnp.sum(reflect_conv_reference(x, k, b) ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(f_c)(x)), np.asarray(jax.grad(f_a)(x)),
        rtol=1e-5, atol=1e-6)


def test_jit_and_vmap():
    x, k, b = _data(3, (4, 5, 6))
    f = jax.jit(lambda x, k, b: reflect_conv_ad(x, k, b, 3, 0.2))
    np.testing.assert_array_equal(
        np.asarray(f(x, k, b)),
        np.asarray(reflect_conv_reference(x, k, b, alpha=0.2)))
    g = jax.jit(jax.grad(
        lambda x: jnp.mean(reflect_conv_ad(x, k, b, 3, 0.2))))
    assert np.all(np.isfinite(np.asarray(g(x))))


def test_non_k3_kernel_rejected():
    """The custom backwards hard-code the k=3 transpose; any other
    kernel size must raise at trace time, not produce silently wrong
    gradients."""
    from sup3r_tpu.ops.conv_ad import reflect_conv_shard_aligned

    x = jnp.asarray(RNG.standard_normal((1, 8, 8, 2)), jnp.float32)
    b = jnp.zeros(4, jnp.float32)
    k5 = jnp.asarray(RNG.standard_normal((5, 5, 2, 4)), jnp.float32)
    with pytest.raises(ValueError, match='k=3'):
        reflect_conv_ad(x, k5, b, 2, 0.2)
    with pytest.raises(ValueError, match='k=3'):
        jax.grad(lambda x: jnp.sum(
            reflect_conv_ad(x, k5, b, 2, 0.2)))(x)
    with pytest.raises(ValueError, match='k=3'):
        reflect_conv_shard_aligned(x, k5, b, 2, 0.2)
    # mixed taps (3 on one dim only) are rejected too
    k35 = jnp.asarray(RNG.standard_normal((3, 5, 2, 4)), jnp.float32)
    with pytest.raises(ValueError, match='k=3'):
        reflect_conv_ad(x, k35, b, 2, None)


def test_train_step_uses_custom_vjp():
    """The fused train path produces the same losses/grads as the
    unfused network (Sup3rGan parity at the step level)."""
    from sup3r_tpu.configs import get_config
    from sup3r_tpu.models import Sup3rGan

    model = Sup3rGan(get_config('spatiotemporal/gen_3x_4x_2f'),
                     get_config('spatiotemporal/disc_test'),
                     learning_rate=1e-4)
    model.init_weights((1, 4, 4, 4, 2), (1, 12, 12, 16, 2))
    lr = RNG.random((2, 4, 4, 4, 2)).astype(np.float32)
    hr = RNG.random((2, 12, 12, 16, 2)).astype(np.float32)
    fused = model.run_gradient_descent(lr, hr, train_gen=True,
                                       train_disc=True)
    model2 = Sup3rGan(get_config('spatiotemporal/gen_3x_4x_2f'),
                      get_config('spatiotemporal/disc_test'),
                      learning_rate=1e-4)
    model2.train_fuse = False
    model2.init_weights((1, 4, 4, 4, 2), (1, 12, 12, 16, 2))
    unfused = model2.run_gradient_descent(lr, hr, train_gen=True,
                                          train_disc=True)
    for key in fused:
        np.testing.assert_allclose(fused[key], unfused[key],
                                   rtol=2e-4, atol=1e-6, err_msg=key)
