"""Kernel/perf ablations on the real TPU: whole-generator forward in
(a) plain XLA fp32, (b) fused pad/conv/crop fp32 (the production
default), (c) fused + Pallas small-block kernel, (d) fused bf16.

Run: python scripts/bench_kernels.py [n_iters]

Timing: the axon-tunneled TPU does not honor ``block_until_ready``
reliably, so each timed repetition ends by fetching the VALUE of a
jitted scalar reduction — the fetch cannot complete before the device
drains its queue (same methodology as bench.py).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from sup3r_tpu.configs import get_config
from sup3r_tpu.models import Sup3rGan
from sup3r_tpu.models.fuse import FusedReflectConv, fuse_network
from sup3r_tpu.models.network import Network

_SSUM = jax.jit(jnp.sum)


def timeit(fn, args, n, reps=3):
    out = fn(*args)
    float(_SSUM(out))  # warm compile + full sync
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(_SSUM(out))  # host value fetch = real completion
        best = min(best, (time.perf_counter() - t0) / n)
    return best, out


def main(n=4):
    chunk = (8, 20, 20, 24, 2)
    model = Sup3rGan(get_config('spatiotemporal/gen_3x_4x_2f'),
                     get_config('spatiotemporal/disc_test'))
    model.init_weights((1, *chunk[1:]), (1, 60, 60, 96, 2))
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
    print(f'fused (XLA):  {t_fused * 1e3:8.3f} ms '
          f'({hr_voxels / t_fused:.3e} voxels/s)  max err {err:.2e}  '
          f'[{t_plain / t_fused:.2f}x]')

    for lyr in flayers:
        if isinstance(lyr, FusedReflectConv):
            lyr.use_pallas = True
    fused_p = jax.jit(lambda p, a: fnet.apply(p, a))
    t_fp, out_fp = timeit(fused_p, (fparams, x), n)
    err_p = float(jnp.abs(out_fp - out_plain).max())
    print(f'fused+pallas: {t_fp * 1e3:8.3f} ms '
          f'({hr_voxels / t_fp:.3e} voxels/s)  max err {err_p:.2e}')
    for lyr in flayers:
        if isinstance(lyr, FusedReflectConv):
            lyr.use_pallas = False

    def bf16_apply(p, a):
        p = jax.tree.map(lambda t: t.astype(jnp.bfloat16), p)
        return fnet.apply(p, a.astype(jnp.bfloat16)).astype(jnp.float32)

    bf16 = jax.jit(bf16_apply)
    t_bf16, out_bf16 = timeit(bf16, (fparams, x), n)
    err_bf16 = float(jnp.abs(out_bf16 - out_plain).max())
    rel = err_bf16 / max(float(jnp.abs(out_plain).max()), 1e-9)
    print(f'fused bf16:   {t_bf16 * 1e3:8.3f} ms '
          f'({hr_voxels / t_bf16:.3e} voxels/s)  max err {err_bf16:.2e}'
          f' (rel {rel:.2e})')


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
