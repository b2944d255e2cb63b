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


@pytest.mark.parametrize('n_spatial,shape', [
    (3, (2, 8, 6, 5, 4)),
    (2, (3, 9, 7, 4)),
])
@pytest.mark.parametrize('alpha', [None, 0.2])
def test_shard_aligned_custom_vjp_grads(n_spatial, shape, alpha):
    """The custom VJP's gradients must match (a) plain autodiff of
    the same shard-aligned forward exactly (to fp32 tolerance) and
    (b) the reflect-pad block's gradients (the two formulations agree
    up to reassociation)."""
    from sup3r_tpu.ops.conv_ad import _sa_impl

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    k = jnp.asarray(
        rng.standard_normal((3,) * n_spatial + (shape[-1], 6)) * 0.1,
        jnp.float32)
    b = jnp.asarray(rng.standard_normal(6) * 0.1, jnp.float32)
    cot = jnp.asarray(rng.standard_normal(
        shape[:-1] + (6,)), jnp.float32)

    def loss_custom(x, k, b):
        return jnp.sum(
            reflect_conv_shard_aligned(x, k, b, n_spatial, alpha)
            * cot)

    def loss_auto(x, k, b):
        return jnp.sum(_sa_impl(x, k, b, n_spatial, alpha)[0] * cot)

    def loss_reflect(x, k, b):
        return jnp.sum(reflect_conv_ad(x, k, b, n_spatial, alpha)
                       * cot)

    gc = jax.grad(loss_custom, argnums=(0, 1, 2))(x, k, b)
    ga = jax.grad(loss_auto, argnums=(0, 1, 2))(x, k, b)
    gr = jax.grad(loss_reflect, argnums=(0, 1, 2))(x, k, b)
    for name, a, c, r in zip(('dx', 'dk', 'db'), ga, gc, gr):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f'{name} vs autodiff')
        np.testing.assert_allclose(np.asarray(c), np.asarray(r),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f'{name} vs reflect')


def test_train_step_shard_aligned_on_spatial_mesh():
    """attach_mesh with a spatial axis auto-enables the shard-aligned
    formulation in the train step and cuts the step's collective
    volume. Measured at this dp1 x sp8 shape (6 hr rows/shard): halo
    129.4 MB -> 36.1 MB; the edge-correction terms add ~22 MB of
    small plane collectives, total 173.6 -> 102.3 MB. (At sp2 the
    effect is marginal — the reflect-pad keeps s1 divisible there, so
    shard shifts are already 1-row; the pathology needs >2 shards.)"""
    from sup3r_tpu.parallel import (
        allreduce_bytes_from_compiled,
        get_mesh_2d,
        halo_bytes_from_compiled,
        replicate,
        shard_batch_spatial,
    )

    if len(jax.devices()) < 8:
        pytest.skip('needs the 8-virtual-device conftest mesh')
    model = Sup3rGan(get_config('spatiotemporal/gen_3x_4x_2f'),
                     get_config('spatiotemporal/disc_test'),
                     learning_rate=1e-4)
    model.init_weights((1, 16, 8, 4, 2), (1, 48, 24, 16, 2))
    mesh2 = get_mesh_2d(1, 8)
    lr, hr = shard_batch_spatial(
        mesh2,
        np.random.default_rng(0).random(
            (2, 16, 8, 4, 2)).astype(np.float32),
        np.random.default_rng(1).random(
            (2, 48, 24, 16, 2)).astype(np.float32))

    def step_bytes(step):
        args = (replicate(mesh2, model.gen_params),
                replicate(mesh2, model.disc_params),
                replicate(mesh2, model._gen_opt_state),
                replicate(mesh2, model._disc_opt_state),
                lr, hr, jnp.float32(1e-3), jnp.bool_(True),
                jnp.bool_(True), jax.random.PRNGKey(0))
        with mesh2:
            c = step.lower(*args).compile()
        return (halo_bytes_from_compiled(c)[0],
                allreduce_bytes_from_compiled(c)[0])

    # plain reflect formulation (no mesh attached yet)
    halo_plain, ar_plain = step_bytes(model.train_step_fn)

    # attach_mesh auto-detects the spatial axis -> shard-aligned
    model.attach_mesh(mesh2)
    assert model._mesh_spatial_axis == 'space'
    assert model._train_step_fn is None  # reset by attach_mesh
    halo_sa, ar_sa = step_bytes(model.train_step_fn)
    assert halo_sa < 0.5 * halo_plain, (halo_sa, halo_plain)
    assert halo_sa + ar_sa < 0.75 * (halo_plain + ar_plain)
