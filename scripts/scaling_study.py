"""Scale-out evidence pack: compile the flagship generator / train
step over virtual device meshes at PRODUCTION shapes and extract the
per-step collective volumes from the compiled SPMD HLO, next to the
analytic models they validate (docs/PERFORMANCE.md scaling study).

Configurations (v5e-8 = one 8-chip v5e host):
  * dp8 inference — 8 production chunks batched over the data axis.
    Embarrassingly parallel: the HLO must contain ZERO collectives.
  * sp8 inference — ONE (160, 20, 24) chunk with s1 split over 8
    chips; XLA inserts conv halo exchanges (collective-permutes).
    Measured halo bytes vs pipeline/memory.py:estimate_halo_bytes.
  * dp8 train — batch-16 fused GAN step, batch over 8 chips;
    gradient all-reduce volume vs the analytic grad-bytes model.
  * dp4 x sp2 train — composed 2D mesh: both collectives at once.

Everything compiles on an 8-virtual-device CPU mesh (no TPU pod in
this image); collective volumes are a property of the partitioned
program, not of the backend, so these numbers transfer to real ICI.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/scaling_study.py
"""

import json

N_DEV = 8

import os  # noqa: E402

os.environ['XLA_FLAGS'] = (
    os.environ.get('XLA_FLAGS', '')
    + f' --xla_force_host_platform_device_count={N_DEV}').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from sup3r_tpu.configs import get_config  # noqa: E402
from sup3r_tpu.models import Sup3rGan  # noqa: E402
from sup3r_tpu.parallel import (  # noqa: E402
    allreduce_bytes_from_compiled,
    get_mesh,
    get_mesh_2d,
    halo_bytes_from_compiled,
    replicate,
    shard_batch,
    shard_batch_spatial,
    shard_spatial,
)
from sup3r_tpu.pipeline.memory import estimate_halo_bytes  # noqa: E402


def _model():
    model = Sup3rGan(get_config('spatiotemporal/gen_3x_4x_2f'),
                     get_config('spatiotemporal/disc_test'),
                     learning_rate=1e-4)
    model.init_weights((1, 12, 12, 12, 2), (1, 36, 36, 48, 2))
    return model


def _collectives(compiled):
    halo, n_halo = halo_bytes_from_compiled(compiled)
    ar, n_ar = allreduce_bytes_from_compiled(compiled)
    return {'halo_bytes': halo, 'n_halo_ops': n_halo,
            'allreduce_bytes': ar, 'n_allreduce_ops': n_ar}


def main():
    model = _model()
    mesh = get_mesh(N_DEV)
    apply_fn, fparams = model._get_fused_apply()
    fwd = jax.jit(lambda p, x: apply_fn(p, x, {}))
    rows = []

    # ---- dp8 inference: 8 production (20,20,24) chunks over 'data'
    x_dp = shard_batch(mesh, np.random.default_rng(0).random(
        (N_DEV, 20, 20, 24, 2)).astype(np.float32))
    p_rep = replicate(mesh, fparams)
    with mesh:
        c = fwd.lower(p_rep, x_dp).compile()
    rows.append({'config': 'dp8 inference',
                 'shape': list(x_dp.shape), **_collectives(c),
                 'analytic_halo_bytes': 0, 'analytic_allreduce_bytes': 0})

    # ---- sp8 inference: ONE (160,20,24) chunk, s1 split over 8.
    # NOTE the measured/analytic gap here is real and diagnosed: the
    # fused reflect-pad grows global s1 by 2 per conv (160 -> 162,
    # not divisible by 8), so XLA re-balances shard boundaries at
    # EVERY conv — most of the wire bytes are multi-row shard shifts,
    # not the 1-row conv halos the analytic model counts (inspect the
    # HLO: 34 true f32[1,1,22,98,64] halos vs 68+ multi-row
    # f32[1,8,...] shifts).
    x_sp = shard_spatial(mesh, np.random.default_rng(1).random(
        (1, 8 * 20, 20, 24, 2)).astype(np.float32), dim=1)
    with mesh:
        c = fwd.lower(p_rep, x_sp).compile()
    halo_est = estimate_halo_bytes(model, x_sp.shape[1:], N_DEV)
    rows.append({'config': 'sp8 inference',
                 'shape': list(x_sp.shape), **_collectives(c),
                 'analytic_halo_bytes': int(halo_est),
                 'analytic_allreduce_bytes': 0})

    # ---- sp8 inference, SHARD-ALIGNED s1 convs (the fix for the
    # above: ops/conv_ad.reflect_conv_shard_aligned — zero-pad s1
    # in-conv + local boundary corrections, no global resize). The
    # forward-pass runner enables this automatically under
    # use_mesh='spatial'.
    model.inference_shard_aligned = True
    apply_sa, fparams_sa = model._get_fused_apply()
    fwd_sa = jax.jit(lambda p, x: apply_sa(p, x, {}))
    p_sa = replicate(mesh, fparams_sa)
    with mesh:
        c = fwd_sa.lower(p_sa, x_sp).compile()
    model.inference_shard_aligned = False
    rows.append({'config': 'sp8 inference shard-aligned',
                 'shape': list(x_sp.shape), **_collectives(c),
                 'analytic_halo_bytes': int(halo_est),
                 'analytic_allreduce_bytes': 0})

    # analytic grad all-reduce volume: one f32 grad per param, both
    # networks (ring all-reduce payload; per-device wire traffic is
    # 2(n-1)/n of this)
    grad_bytes = 4 * sum(
        int(np.prod(p.shape)) for p in jax.tree.leaves(
            (model.gen_params, model.disc_params)))

    # ---- dp8 train: batch-16 fused GAN step over 'data'
    step = model.train_step_fn
    lr = shard_batch(mesh, np.random.default_rng(2).random(
        (16, 12, 12, 12, 2)).astype(np.float32))
    hr = shard_batch(mesh, np.random.default_rng(3).random(
        (16, 36, 36, 48, 2)).astype(np.float32))
    g = replicate(mesh, model.gen_params)
    d = replicate(mesh, model.disc_params)
    go = replicate(mesh, model._gen_opt_state)
    do = replicate(mesh, model._disc_opt_state)
    args = (g, d, go, do, lr, hr, jnp.float32(1e-3), jnp.bool_(True),
            jnp.bool_(True), jax.random.PRNGKey(0))
    with mesh:
        c = step.lower(*args).compile()
    rows.append({'config': 'dp8 train',
                 'shape': list(lr.shape), **_collectives(c),
                 'analytic_halo_bytes': 0,
                 'analytic_allreduce_bytes': grad_bytes})

    # ---- dp4 x sp2 train: composed 2D mesh
    mesh2 = get_mesh_2d(4, 2)
    lr2, hr2 = shard_batch_spatial(
        mesh2,
        np.random.default_rng(4).random(
            (16, 12, 12, 12, 2)).astype(np.float32),
        np.random.default_rng(5).random(
            (16, 36, 36, 48, 2)).astype(np.float32))
    g = replicate(mesh2, model.gen_params)
    d = replicate(mesh2, model.disc_params)
    go = replicate(mesh2, model._gen_opt_state)
    do = replicate(mesh2, model._disc_opt_state)
    args = (g, d, go, do, lr2, hr2, jnp.float32(1e-3),
            jnp.bool_(True), jnp.bool_(True), jax.random.PRNGKey(0))
    with mesh2:
        c = step.lower(*args).compile()
    halo_est2 = estimate_halo_bytes(model, lr2.shape[1:], 2)
    rows.append({'config': 'dp4xsp2 train',
                 'shape': list(lr2.shape), **_collectives(c),
                 # fwd halo + same again in the backward pass (dgrad
                 # needs the same boundary planes), per batch shard
                 'analytic_halo_bytes': int(2 * halo_est2 * 16 // 4),
                 'analytic_allreduce_bytes': grad_bytes})

    # ---- dp4 x sp2 train, SHARD-ALIGNED s1 convs — forced on to
    # document WHY the auto gate requires a >= 4-wide spatial axis:
    # at sp2 the reflect pad keeps s1 divisible (shard shifts are
    # already 1-row) and the boundary-correction collectives make the
    # aligned path a net LOSS here (halo 404 -> 327 MB but all-reduce
    # 254 -> 447 MB). At sp8 it wins big (129.4 -> 36.1 MB halo,
    # total 1.7x down — tests/forward_pass/test_shard_aligned_conv.py
    # measures it). attach_mesh auto-enables only when the spatial
    # axis is >= 4 wide (models/abstract.py _auto_shard_aligned).
    model.train_shard_aligned = True
    model._train_step_fn = None
    step_sa = model.train_step_fn
    with mesh2:
        c = step_sa.lower(*args).compile()
    model.train_shard_aligned = None
    model._train_step_fn = None
    rows.append({'config': 'dp4xsp2 train shard-aligned',
                 'shape': list(lr2.shape), **_collectives(c),
                 'analytic_halo_bytes': int(2 * halo_est2 * 16 // 4),
                 'analytic_allreduce_bytes': grad_bytes})

    for r in rows:
        print(json.dumps(r))

    # projection: v5e ICI ~ 186 GB/s/link bidirectional; collective
    # time vs the measured single-chip step/apply times
    print()
    print('| config | measured halo MB | analytic halo MB | '
          'measured all-reduce MB | analytic all-reduce MB |')
    print('|---|---|---|---|---|')
    for r in rows:
        print(f"| {r['config']} | "
              f"{r['halo_bytes'] / 1e6:.2f} ({r['n_halo_ops']} ops) | "
              f"{r['analytic_halo_bytes'] / 1e6:.2f} | "
              f"{r['allreduce_bytes'] / 1e6:.2f} "
              f"({r['n_allreduce_ops']} ops) | "
              f"{r['analytic_allreduce_bytes'] / 1e6:.2f} |")


if __name__ == '__main__':
    main()
