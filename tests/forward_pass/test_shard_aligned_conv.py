"""Shard-aligned s1 conv formulation (round 4): equivalence with the
default reflect-pad path and the measured wire-volume reduction under
s1 sharding.

Background (scripts/scaling_study.py): the fused reflect-pad grows
global s1 by 2 per conv, so under ``shard_spatial`` sharding XLA
re-balances shard boundaries at EVERY conv — most of the sp-path wire
bytes were multi-row shard shifts, not conv halos. The shard-aligned
formulation (ops/conv_ad.reflect_conv_shard_aligned) zero-pads s1
inside the conv and restores reflect semantics with local boundary
corrections; the forward-pass runner enables it automatically when
``use_mesh='spatial'``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sup3r_tpu.configs import get_config
from sup3r_tpu.models import Sup3rGan
from sup3r_tpu.ops.conv_ad import (
    reflect_conv_ad,
    reflect_conv_shard_aligned,
)


@pytest.mark.parametrize('n_spatial,shape', [
    (3, (2, 8, 6, 5, 4)),
    (2, (3, 9, 7, 4)),
])
@pytest.mark.parametrize('alpha', [None, 0.2])
def test_shard_aligned_matches_reflect(n_spatial, shape, alpha):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    k = jnp.asarray(
        rng.standard_normal((3,) * n_spatial + (shape[-1], 6)) * 0.1,
        jnp.float32)
    b = jnp.asarray(rng.standard_normal(6) * 0.1, jnp.float32)
    a = reflect_conv_ad(x, k, b, n_spatial, alpha)
    s = reflect_conv_shard_aligned(x, k, b, n_spatial, alpha)
    assert a.shape == s.shape
    np.testing.assert_allclose(np.asarray(s), np.asarray(a),
                               atol=1e-5)


def test_whole_generator_equivalence_and_cache_key():
    """Flagship generator output with inference_shard_aligned on vs
    off, and the fused-apply cache distinguishes the two."""
    model = Sup3rGan(get_config('spatiotemporal/gen_3x_4x_2f'),
                     get_config('spatiotemporal/disc_test'))
    model.init_weights((1, 8, 8, 4, 2), (1, 24, 24, 16, 2))
    x = np.random.default_rng(1).random(
        (1, 8, 8, 4, 2)).astype(np.float32)
    base = np.asarray(model.generate(x, norm_in=False,
                                     un_norm_out=False))
    model.inference_shard_aligned = True
    aligned = np.asarray(model.generate(x, norm_in=False,
                                        un_norm_out=False))
    model.inference_shard_aligned = False
    again = np.asarray(model.generate(x, norm_in=False,
                                      un_norm_out=False))
    np.testing.assert_allclose(aligned, base, atol=1e-4)
    np.testing.assert_array_equal(again, base)


def test_shard_aligned_cuts_wire_volume():
    """Compiled 8-way s1-sharded generator: the shard-aligned path
    moves <50% of the default path's total collective bytes even at
    this tiny test shape (4 rows/shard — boundary corrections are a
    third of each shard here; at the production shape, 20 rows/shard,
    scripts/scaling_study.py measures 600 MB -> 96 MB, a 6.2x
    reduction)."""
    from sup3r_tpu.parallel import (
        allreduce_bytes_from_compiled,
        get_mesh,
        halo_bytes_from_compiled,
        replicate,
        shard_spatial,
    )

    if len(jax.devices()) < 8:
        pytest.skip('needs the 8-virtual-device conftest mesh')
    model = Sup3rGan(get_config('spatiotemporal/gen_3x_4x_2f'),
                     get_config('spatiotemporal/disc_test'))
    model.init_weights((1, 8, 8, 4, 2), (1, 24, 24, 16, 2))
    mesh = get_mesh(8)
    x = shard_spatial(mesh, np.zeros((1, 32, 8, 4, 2), np.float32),
                      dim=1)

    def compiled_bytes():
        apply_fn, fparams = model._get_fused_apply()
        p = replicate(mesh, fparams)
        with mesh:
            c = jax.jit(
                lambda pp, a: apply_fn(pp, a, {})).lower(p, x).compile()
        halo, _ = halo_bytes_from_compiled(c)
        ar, _ = allreduce_bytes_from_compiled(c)
        return halo, ar

    halo0, ar0 = compiled_bytes()
    model.inference_shard_aligned = True
    halo1, ar1 = compiled_bytes()
    model.inference_shard_aligned = False
    assert halo0 > 0
    total0, total1 = halo0 + ar0, halo1 + ar1
    assert total1 < 0.5 * total0, (total1, total0)
