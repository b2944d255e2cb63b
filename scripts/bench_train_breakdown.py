"""Decompose the fused train step's cost: generator fwd, gen fwd+bwd,
disc fwd, and the full step — to locate where achieved TFLOP/s drops
from the ~33 TFLOP/s inference rate to the ~17 TFLOP/s step rate.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_train_breakdown.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from sup3r_tpu.configs import get_config
from sup3r_tpu.models import Sup3rGan
from sup3r_tpu.utilities.flops import estimate_flops


def timed(fn, *args, n=4, reps=3):
    out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0]))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    tb = 16
    model = Sup3rGan(get_config('spatiotemporal/gen_3x_4x_2f'),
                     get_config('spatiotemporal/disc_test'),
                     learning_rate=1e-4)
    model.init_weights((1, 12, 12, 12, 2), (1, 36, 36, 48, 2))
    rng = np.random.default_rng(1)
    lr = jax.device_put(rng.random((tb, 12, 12, 12, 2)).astype(
        np.float32))
    hr = jax.device_put(rng.random((tb, 36, 36, 48, 2)).astype(
        np.float32))
    gen, disc = model.generator, model.discriminator
    gp, dp = model.gen_params, model.disc_params

    fwd = jax.jit(lambda p, x: gen.apply(p, x))
    dfwd = jax.jit(lambda p, x: disc.apply(p, x))

    def gen_loss(p, x, y):
        return jnp.mean((gen.apply(p, x) - y) ** 2)

    gbwd = jax.jit(jax.grad(gen_loss))

    def disc_loss(p, y):
        return jnp.mean(disc.apply(p, y) ** 2)

    dbwd = jax.jit(jax.grad(disc_loss))

    cases = {
        'gen fwd': (fwd, (gp, lr)),
        'gen fwd+bwd': (gbwd, (gp, lr, hr)),
        'disc fwd': (dfwd, (dp, hr)),
        'disc fwd+bwd': (dbwd, (dp, hr)),
    }
    for name, (fn, args) in cases.items():
        t = timed(fn, *args)
        fl = estimate_flops(fn, *args)
        print(f'{name:14s} {t * 1e3:7.1f} ms  {fl / t / 1e12:6.2f} '
              f'TFLOP/s  ({fl / 1e9:.1f} GFLOP)')

    step = model.train_step_fn
    state = (model.gen_params, model.disc_params,
             model._gen_opt_state, model._disc_opt_state)
    w = jnp.float32(1e-3)
    tt = jnp.bool_(True)
    key = jax.random.PRNGKey(0)

    def full(state):
        *new_state, det = step(*state, lr, hr, w, tt, tt, key)
        return new_state, det

    # warm + time without donation reuse issues: rebuild state refs
    (state, det) = full(state)
    float(det['loss_gen'])
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(4):
            state, det = full(state)
        float(det['loss_gen'])
        best = min(best, (time.perf_counter() - t0) / 4)
    fl = estimate_flops(
        model._raw_step, *state, lr, hr, w, tt, tt, key)
    print(f'{"full step":14s} {best * 1e3:7.1f} ms  '
          f'{fl / best / 1e12:6.2f} TFLOP/s  ({fl / 1e9:.1f} GFLOP)')


if __name__ == '__main__':
    main()
