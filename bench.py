"""Benchmark: HR voxels/sec/chip for chunked forward-pass generation on
the flagship spatiotemporal GAN (the BASELINE.md north-star metric).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference runs TF conv kernels on CPU for inference
(use_cpu=True default, reference: sup3r/pipeline/strategy.py:280).
Measured in this image with raw-TF ops building the same 3x/4x ST-GAN
architecture on the same (4, 12, 12, 12, 2) chunk batch:
3.34e4 HR voxels/sec (single process, tf.function compiled).
vs_baseline reports speedup over that measurement.

Timing note: on the axon-tunneled TPU, ``block_until_ready`` does not
reliably wait for remote execution, so each timed repetition ends with
a jitted scalar reduction whose VALUE is fetched to the host — the
fetch cannot complete before the device finishes the queued work.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sup3r_tpu.configs import get_config
    from sup3r_tpu.models import Sup3rGan

    # flagship: 3x spatial / 4x temporal 2-feature ST GAN
    model = Sup3rGan(get_config('spatiotemporal/gen_3x_4x_2f'),
                     get_config('spatiotemporal/disc_test'))
    # production-like device batch of padded lr chunks
    chunk = (8, 20, 20, 24, 2)   # (chunks, s1, s2, t, f)
    model.init_weights((1, *chunk[1:]), (1, 60, 60, 96, 2))
    # the production inference path: pad/conv/crop blocks fused to
    # reflect-pad-1 + valid conv (bit-identical, ~1.5x; default in
    # Sup3rGan.generate)
    apply_fn, fparams = model._get_fused_apply()
    params = jax.device_put(fparams)

    fwd = jax.jit(lambda p, x: apply_fn(p, x, {}))
    ssum = jax.jit(jnp.sum)
    x = jnp.asarray(
        np.random.default_rng(0).random(chunk), dtype=jnp.float32)

    out = fwd(params, x)
    float(ssum(out))  # warm both compiles + full sync
    n_iters = 4
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = fwd(params, x)
        float(ssum(out))  # host value fetch = real device completion
        best = min(best, (time.perf_counter() - t0) / n_iters)

    hr_voxels = int(np.prod(out.shape[:-1]))
    voxels_per_sec = hr_voxels / best
    baseline = 3.34e4  # measured TF-CPU, HR voxels/sec (see docstring)
    print(json.dumps({
        'metric': 'forward_pass_hr_voxels_per_sec_per_chip',
        'value': round(voxels_per_sec, 1),
        'unit': 'voxels/s',
        'vs_baseline': round(voxels_per_sec / baseline, 2),
    }))


if __name__ == '__main__':
    main()
