"""Kernel/perf ablations on the real TPU: whole-generator forward in
(a) plain XLA fp32, (b) fused-pallas fp32, (c) plain XLA bf16.

Run: python scripts/bench_kernels.py [n_iters]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from sup3r_tpu.configs import get_config
from sup3r_tpu.models import Sup3rGan
from sup3r_tpu.models.fuse import fuse_network
from sup3r_tpu.models.network import Network


def timeit(fn, args, n):
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


def main(n=20):
    chunk = (4, 12, 12, 12, 2)
    model = Sup3rGan(get_config('spatiotemporal/gen_3x_4x_2f'),
                     get_config('spatiotemporal/disc_test'))
    model.init_weights((1, *chunk[1:]), (1, 36, 36, 48, 2))
    gen = model.generator
    params = jax.device_put(model.gen_params)
    x = jnp.asarray(np.random.default_rng(0).random(chunk), jnp.float32)
    hr_voxels = int(np.prod((chunk[0], chunk[1] * 3, chunk[2] * 3,
                             chunk[3] * 4)))

    plain = jax.jit(lambda p, a: gen.apply(p, a))
    t_plain, out_plain = timeit(plain, (params, x), n)
    print(f'plain fp32:   {t_plain * 1e3:8.3f} ms '
          f'({hr_voxels / t_plain:.3e} voxels/s)')

    flayers, fparams = fuse_network(gen.layers, model.gen_params)
    fnet = Network(flayers)
    fparams = jax.device_put(fparams)
    fused = jax.jit(lambda p, a: fnet.apply(p, a))
    t_fused, out_fused = timeit(fused, (fparams, x), n)
    err = float(jnp.abs(out_fused - out_plain).max())
    print(f'fused pallas: {t_fused * 1e3:8.3f} ms '
          f'({hr_voxels / t_fused:.3e} voxels/s)  max err {err:.2e}')

    params_bf16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16), params)
    bf16 = jax.jit(lambda p, a: gen.apply(
        p, a.astype(jnp.bfloat16)).astype(jnp.float32))
    t_bf16, out_bf16 = timeit(bf16, (params_bf16, x), n)
    err_bf16 = float(jnp.abs(out_bf16 - out_plain).max())
    rel = err_bf16 / max(float(jnp.abs(out_plain).max()), 1e-9)
    print(f'plain bf16:   {t_bf16 * 1e3:8.3f} ms '
          f'({hr_voxels / t_bf16:.3e} voxels/s)  max err {err_bf16:.2e}'
          f' (rel {rel:.2e})')

    # bigger batch to amortize dispatch
    big = jnp.concatenate([x] * 4, axis=0)
    t_big, _ = timeit(plain, (params, big), max(n // 2, 5))
    print(f'plain fp32 batch16: {t_big * 1e3:8.3f} ms '
          f'({4 * hr_voxels / t_big:.3e} voxels/s)')
    t_bigf, _ = timeit(fused, (fparams, big), max(n // 2, 5))
    print(f'fused batch16:      {t_bigf * 1e3:8.3f} ms '
          f'({4 * hr_voxels / t_bigf:.3e} voxels/s)')


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
