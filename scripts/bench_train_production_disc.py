"""Fused train-step benchmark with the PRODUCTION discriminator
(VERDICT r4 #3): the real 'valid'-padding spatiotemporal disc
(reference sup3r/configs/spatiotemporal/disc.json) needs >= 61 px
spatial inputs, so it is timed at an HR sample of (72, 72, 72) —
a production-shaped sample — next to the 'same'-padding disc_test
at the SAME shape so the disc's contribution is attributable, and
disc_test at the (36, 36, 48) bench shape as the cross-round anchor.

Timing follows bench.py's honest-sync method: the batch lives on
device, the jitted step feeds donated state back in, and each timed
block ends with ONE loss-value fetch (block_until_ready does not
reliably wait on the tunneled axon backend).

Run: PYTHONPATH=/root/repo:/root/.axon_site python
     scripts/bench_train_production_disc.py
"""

import sys
import time

import numpy as np


def time_step(model, tb, tlr, thr, n_iters=4, n_blocks=3):
    import jax
    import jax.numpy as jnp

    from sup3r_tpu.utilities.flops import estimate_flops

    rng = np.random.default_rng(1)
    lr_b = jax.device_put(rng.random((tb, *tlr, 2)).astype(np.float32))
    hr_b = jax.device_put(rng.random((tb, *thr, 2)).astype(np.float32))
    model.init_weights((1, *tlr, 2), (1, *thr, 2))
    _ = model.train_step_fn
    args = (model.gen_params, model.disc_params,
            model._gen_opt_state, model._disc_opt_state,
            lr_b, hr_b, jnp.float32(1e-3), jnp.bool_(True),
            jnp.bool_(True), jax.random.PRNGKey(0))
    try:
        flops = float(estimate_flops(model._raw_step, *args)) or None
    except Exception:
        flops = None
    step = model.train_step_fn
    state = list(args[:4])
    print(f'  warm compile (hr={thr}, batch={tb})...', flush=True)
    *state, det = step(*state, lr_b, hr_b, *args[6:])
    float(det['loss_gen'])
    best = np.inf
    for _ in range(n_blocks):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            *state, det = step(*state, lr_b, hr_b, *args[6:])
        float(det['loss_gen'])
        best = min(best, (time.perf_counter() - t0) / n_iters)
    voxels = tb * int(np.prod(thr))
    tflops = flops / best / 1e12 if flops else None
    return best, voxels / best, tflops


def main():
    from sup3r_tpu.configs import get_config
    from sup3r_tpu.models import Sup3rGan

    gen_cfg = get_config('spatiotemporal/gen_3x_4x_2f')
    # the production 'valid' disc (20 layers, stride-2 stacks) needs
    # >= 62 px spatial AND >= ~64 temporal steps (probed via
    # Network.init shape inference), so the production-shaped sample
    # is (72, 72, 72) — batch 4 carries 1.5x the bench tier's HR
    # voxels/step
    cases = [
        # (label, disc config, batch, lr shape, hr shape)
        ('disc_test @ bench shape', 'spatiotemporal/disc_test',
         16, (12, 12, 12), (36, 36, 48)),
        ('disc_test @ production shape', 'spatiotemporal/disc_test',
         4, (24, 24, 18), (72, 72, 72)),
        ('PRODUCTION disc @ production shape', 'spatiotemporal/disc',
         4, (24, 24, 18), (72, 72, 72)),
    ]
    for label, disc_name, tb, tlr, thr in cases:
        model = Sup3rGan(gen_cfg, get_config(disc_name),
                         learning_rate=1e-4)
        t, vps, tflops = time_step(model, tb, tlr, thr)
        tf = f'{tflops:.1f}' if tflops else '?'
        print(f'{label}: {t * 1e3:.1f} ms/step, {vps:.3g} HR voxels/s,'
              f' {tf} TFLOP/s', flush=True)


if __name__ == '__main__':
    sys.exit(main())
