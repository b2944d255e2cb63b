"""estimate_flops: analytic FLOP counts for the primitives that carry
the models' work (convs + matmuls), including nested jaxprs."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sup3r_tpu.utilities.flops import estimate_flops


def test_matmul_flops():
    f = lambda a, b: a @ b  # noqa: E731
    got = estimate_flops(f, jnp.ones((64, 32)), jnp.ones((32, 16)))
    assert got == 2 * 64 * 32 * 16


def test_conv_flops():
    def conv(x, k):
        return lax.conv_general_dilated(
            x, k, (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    got = estimate_flops(conv, jnp.ones((1, 8, 8, 4)),
                         jnp.ones((3, 3, 4, 8)))
    assert got == 2 * (8 * 8 * 8) * 4 * 9


def test_nested_jit_and_grad_counted():
    g = jax.jit(lambda a, b: jnp.sum(a @ b))
    fwd = estimate_flops(g, jnp.ones((64, 32)), jnp.ones((32, 16)))
    both = estimate_flops(jax.grad(g), jnp.ones((64, 32)),
                          jnp.ones((32, 16)))
    assert both == 2 * fwd  # forward + one transpose matmul


def test_generator_flops_scale_with_batch():
    from sup3r_tpu.configs import get_config
    from sup3r_tpu.models import Sup3rGan

    model = Sup3rGan(get_config('spatiotemporal/gen_3x_4x_2f'),
                     get_config('spatiotemporal/disc_test'))
    model.init_weights((1, 8, 8, 8, 2), (1, 24, 24, 32, 2))
    apply_fn, params = model._get_fused_apply()
    f1 = estimate_flops(lambda p, x: apply_fn(p, x, {}), params,
                        jnp.ones((1, 8, 8, 8, 2)))
    f2 = estimate_flops(lambda p, x: apply_fn(p, x, {}), params,
                        jnp.ones((2, 8, 8, 8, 2)))
    assert f1 > 1e9  # 50-layer conv net: billions of FLOPs per sample
    np.testing.assert_allclose(f2, 2 * f1, rtol=1e-6)
