"""Mesh validation beyond the 8-device conftest width: 16- and
32-device virtual CPU meshes (the widths a real v5e pod slice uses).

Covers, per width (VERDICT r4 weak #6):
  * dp train-step loss equality vs a 1-device mesh on the same batch
  * sp (spatial) sharded forward equality vs unsharded, and the
    loud ValueError on s1 NOT divisible by the mesh width
  * the composed dp x sp 2D mesh with the shard-aligned conv
    formulation auto-engaged by the >=4 width gate (sp4 at width 16,
    sp8 at width 32), including shard_batch_spatial's uneven-split
    rejection
  * collective-byte measurement (halo + all-reduce) of the compiled
    sp-sharded forward, printed for the scaling record

The XLA virtual-device count is fixed at process start, so each width
runs in a fresh subprocess (same pattern as test_dcn_multiprocess).
"""

import os
import subprocess
import sys

import pytest

WORKER = r'''
import os, sys
n = int(sys.argv[1])
os.environ['XLA_FLAGS'] = (
    f'--xla_force_host_platform_device_count={n}')
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')
sys.path.insert(0, '/root/repo')
import numpy as np
import jax.numpy as jnp
from sup3r_tpu.models import Sup3rGan
from sup3r_tpu.parallel import (
    allreduce_bytes_from_compiled, get_mesh, get_mesh_2d,
    halo_bytes_from_compiled, replicate, shard_batch,
    shard_batch_spatial, shard_spatial)
from sup3r_tpu.ops.conv_ad import shard_aligned_worthwhile

assert jax.device_count() == n, (jax.device_count(), n)

# small ST generator built from the flagship's fusible unit
# (reflect pad -> conv -> crop -> LeakyReLU) so the shard-aligned
# formulation applies
PAD = {'class': 'FlexiblePadding',
       'paddings': [[0, 0], [3, 3], [3, 3], [3, 3], [0, 0]],
       'mode': 'REFLECT'}
def unit(filters):
    return [dict(PAD),
            {'class': 'Conv3D', 'filters': filters, 'kernel_size': 3,
             'strides': 1},
            {'class': 'Cropping3D', 'cropping': 2},
            {'class': 'LeakyReLU', 'alpha': 0.2}]
gen = (unit(8)
       + [{'class': 'SpatioTemporalExpansion', 'spatial_mult': 2,
           'temporal_mult': 2, 'temporal_method': 'nearest'}]
       + unit(2))
disc = [{'class': 'Conv3D', 'filters': 4, 'kernel_size': 3,
         'strides': 2, 'padding': 'same'},
        {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]

def fresh_model(hr_shape=(1, 8, 8, 4, 2)):
    # the disc's Flatten->Dense binds to the HR sample shape, so each
    # phase inits with the HR shape it trains at
    m = Sup3rGan(gen, disc, learning_rate=1e-3)
    m.init_weights((1, hr_shape[1] // 2, hr_shape[2] // 2,
                    hr_shape[3] // 2, 2), hr_shape, seed=11)
    return m

rng = np.random.default_rng(0)
batch = n  # one sample per device
lr_g = rng.random((batch, 4, 4, 2, 2)).astype(np.float32)
hr_g = rng.random((batch, 8, 8, 4, 2)).astype(np.float32)

def run_step(model, mesh, lr, hr):
    args = (replicate(mesh, model.gen_params),
            replicate(mesh, model.disc_params),
            replicate(mesh, model._gen_opt_state),
            replicate(mesh, model._disc_opt_state),
            lr, hr, jnp.float32(1e-3), jnp.bool_(True),
            jnp.bool_(True), jax.random.PRNGKey(0))
    with mesh:
        out = model.train_step_fn(*args)
        jax.block_until_ready(out[-1])
    return {k: float(v) for k, v in out[-1].items()}

# 1) dp equality: 1-device mesh vs n-device mesh, same global batch
m_ref = fresh_model()
mesh1 = get_mesh(1)
losses_1 = run_step(m_ref, mesh1,
                    shard_batch(mesh1, lr_g), shard_batch(mesh1, hr_g))
m_dp = fresh_model()
mesh_n = get_mesh(n)
losses_n = run_step(m_dp, mesh_n,
                    shard_batch(mesh_n, lr_g), shard_batch(mesh_n, hr_g))
for k, v in losses_1.items():
    assert np.isfinite(v) and np.isfinite(losses_n[k]), (k, v)
    assert np.isclose(losses_n[k], v, rtol=2e-4, atol=2e-5), (
        'dp loss mismatch', k, losses_n[k], v)

# 2) sp sharded forward equality + non-divisible rejection
m = fresh_model()
fwd = jax.jit(lambda p, x: m.generator.apply(p, x))
one = rng.random((1, 2 * n, 8, 2, 2)).astype(np.float32)
base = np.asarray(fwd(m.gen_params, jnp.asarray(one)))
x_sp = shard_spatial(mesh_n, one, dim=1)
p_rep = replicate(mesh_n, m.gen_params)
with mesh_n:
    compiled = jax.jit(
        lambda p, x: m.generator.apply(p, x)).lower(p_rep, x_sp).compile()
    sharded = np.asarray(compiled(p_rep, x_sp))
assert sharded.shape == base.shape
np.testing.assert_allclose(sharded, base, atol=2e-5)
halo, _ = halo_bytes_from_compiled(compiled)
ar, _ = allreduce_bytes_from_compiled(compiled)
assert halo > 0  # conv halos must actually cross shards
try:
    shard_spatial(mesh_n, rng.random(
        (1, 2 * n + 3, 8, 2, 2)).astype(np.float32), dim=1)
    raise SystemExit('FAIL: uneven shard_spatial did not raise')
except ValueError:
    pass

# 3) composed dp x sp with the shard-aligned width gate engaged
sp = 4 if n == 16 else 8
dp = n // sp
assert shard_aligned_worthwhile(sp)
mesh2 = get_mesh_2d(dp, sp)
m2 = fresh_model(hr_shape=(1, 4 * sp, 8, 4, 2))
m2.attach_mesh(mesh2)
assert m2._mesh_spatial_axis == 'space'
assert m2._auto_shard_aligned() is True
# s1 of the HR sample = 4*sp rows -> 4 rows/shard after 2x enhance
lr2 = rng.random((dp, 2 * sp, 4, 2, 2)).astype(np.float32)
hr2 = rng.random((dp, 4 * sp, 8, 4, 2)).astype(np.float32)
losses_2d = run_step(
    m2, mesh2, shard_batch_spatial(mesh2, lr2),
    shard_batch_spatial(mesh2, hr2))
assert all(np.isfinite(v) for v in losses_2d.values()), losses_2d
# same batch through the plain formulation on one device
m2_ref = fresh_model(hr_shape=(1, 4 * sp, 8, 4, 2))
l2_ref = run_step(m2_ref, mesh1, shard_batch(mesh1, lr2),
                  shard_batch(mesh1, hr2))
for k, v in l2_ref.items():
    assert np.isclose(losses_2d[k], v, rtol=5e-4, atol=5e-4), (
        'dpxsp shard-aligned loss mismatch', k, losses_2d[k], v)
# uneven splits on either axis are rejected loudly
for bad in ((dp + 1, 2 * sp, 4, 2, 2), (dp, 2 * sp + 1, 4, 2, 2)):
    try:
        shard_batch_spatial(mesh2, np.zeros(bad, np.float32))
        raise SystemExit(f'FAIL: uneven {bad} did not raise')
    except ValueError:
        pass

print(f'OK width={n} sp={sp} fwd_halo_bytes={halo} '
      f'fwd_ar_bytes={ar}', flush=True)
'''


@pytest.mark.parametrize('n_devices', [16, 32])
def test_wide_mesh(n_devices, tmp_path):
    worker_fp = str(tmp_path / 'worker.py')
    with open(worker_fp, 'w') as f:
        f.write(WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS')}
    out = subprocess.run(
        [sys.executable, worker_fp, str(n_devices)],
        capture_output=True, text=True, timeout=560, env=env)
    assert out.returncode == 0, (
        f'wide-mesh worker failed at width {n_devices}:\n'
        f'{out.stdout}\n{out.stderr}')
    assert f'OK width={n_devices}' in out.stdout, out.stdout
