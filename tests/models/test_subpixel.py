"""Subpixel tail conv (ops/subpixel.py): the pre-expansion
reformulation must reproduce depth_to_space -> LeakyReLU ->
reflect-conv exactly (phases, reflect boundaries incl. corners, time
taps, bias, activations, gradients)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sup3r_tpu.ops.pallas_kernels import reflect_conv_reference
from sup3r_tpu.ops.subpixel import subpixel_tail_conv

RNG = np.random.default_rng(3)


def _d2s(z, m):
    """TF-ordered spatial depth_to_space for 5D (matches
    SpatioTemporalExpansion's spatial path)."""
    b, s1, s2, t, d = z.shape
    c = d // (m * m)
    z = jnp.reshape(z, (b, s1, s2, t, m, m, c))
    z = jnp.transpose(z, (0, 1, 4, 2, 5, 3, 6))
    return jnp.reshape(z, (b, s1 * m, s2 * m, t, c))


def _reference(z, kernel, bias, m, alpha_prev, alpha):
    x = _d2s(jnp.asarray(z), m)
    if alpha_prev is not None:
        x = jax.nn.leaky_relu(x, alpha_prev)
    return reflect_conv_reference(x, jnp.asarray(kernel),
                                  jnp.asarray(bias), alpha=alpha)


@pytest.mark.parametrize('m,ci,co,shape', [
    (3, 8, 2, (2, 5, 4, 6)),
    (2, 4, 3, (1, 3, 5, 4)),
    (3, 2, 2, (2, 2, 2, 3)),   # tiny: boundary cells dominate
])
@pytest.mark.parametrize('alpha_prev,alpha', [(0.2, None), (0.1, 0.3),
                                              (None, None)])
def test_matches_reference(m, ci, co, shape, alpha_prev, alpha):
    z = RNG.standard_normal((*shape, m * m * ci)).astype(np.float32)
    k = RNG.standard_normal((3, 3, 3, ci, co)).astype(np.float32)
    b = RNG.standard_normal(co).astype(np.float32) * 0.1
    got = subpixel_tail_conv(jnp.asarray(z), jnp.asarray(k),
                             jnp.asarray(b), m,
                             alpha_prev=alpha_prev, alpha=alpha)
    ref = _reference(z, k, b, m, alpha_prev, alpha)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match_reference():
    m, ci, co = 3, 4, 2
    z = RNG.standard_normal((1, 3, 3, 4, m * m * ci)).astype(
        np.float32)
    k = RNG.standard_normal((3, 3, 3, ci, co)).astype(np.float32)
    b = RNG.standard_normal(co).astype(np.float32) * 0.1
    cot = RNG.standard_normal((1, 9, 9, 4, co)).astype(np.float32)

    def loss_sub(z, k, b):
        return jnp.sum(subpixel_tail_conv(
            z, k, b, m, alpha_prev=0.2) * cot)

    def loss_ref(z, k, b):
        return jnp.sum(_reference(z, k, b, m, 0.2, None) * cot)

    gs = jax.grad(loss_sub, argnums=(0, 1, 2))(
        jnp.asarray(z), jnp.asarray(k), jnp.asarray(b))
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(
        jnp.asarray(z), jnp.asarray(k), jnp.asarray(b))
    for name, a, c in zip(('dz', 'dk', 'db'), gr, gs):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=3e-5, atol=3e-5,
                                   err_msg=name)


def test_jit_compiles():
    m, ci, co = 3, 8, 2
    z = jnp.asarray(RNG.standard_normal(
        (2, 4, 4, 6, m * m * ci)).astype(np.float32))
    k = jnp.asarray(RNG.standard_normal(
        (3, 3, 3, ci, co)).astype(np.float32))
    b = jnp.asarray(np.zeros(co, np.float32))
    f = jax.jit(lambda z, k, b: subpixel_tail_conv(
        z, k, b, 3, alpha_prev=0.2))
    out = f(z, k, b)
    assert out.shape == (2, 12, 12, 6, co)
    assert np.isfinite(np.asarray(out)).all()


def test_gan_subpixel_tail_flag():
    """Sup3rGan.inference_subpixel_tail folds the flagship tail and
    generate() stays tolerance-equal to the default fused path."""
    from sup3r_tpu.configs import get_config
    from sup3r_tpu.models import Sup3rGan
    from sup3r_tpu.models.fuse import SubpixelTailConv

    model = Sup3rGan(get_config('spatiotemporal/gen_3x_4x_2f'),
                     get_config('spatiotemporal/disc_test'))
    model.init_weights((1, 6, 6, 4, 2), (1, 18, 18, 16, 2))
    lr = RNG.standard_normal((2, 6, 6, 4, 2)).astype(np.float32)
    base = model.generate(lr, norm_in=False, un_norm_out=False)

    # the fuse pass structurally replaces expansion+act+tail
    from sup3r_tpu.models.fuse import fuse_network, fuse_subpixel_tail

    flayers, fparams = fuse_network(model.generator.layers,
                                    model.gen_params)
    slayers, sparams = fuse_subpixel_tail(flayers, fparams)
    assert isinstance(slayers[-1], SubpixelTailConv)
    # fuse_network folds the pre-tail activation into the preceding
    # conv's epilogue, so the subpixel rewrite collapses only
    # [expansion, tail] (alpha_prev comes from upstream)
    assert len(slayers) == len(flayers) - 1
    assert slayers[-1].alpha_prev is None
    assert len(sparams) == len(slayers)

    model.inference_subpixel_tail = True
    sub = model.generate(lr, norm_in=False, un_norm_out=False)
    assert sub.shape == base.shape
    np.testing.assert_allclose(sub, base, rtol=2e-2, atol=2e-2)
    # on CPU the conv is true fp32, so the match is much tighter
    np.testing.assert_allclose(sub, base, rtol=1e-4, atol=1e-4)
