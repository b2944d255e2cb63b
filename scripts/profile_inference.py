"""Per-stage op-mix profile of the fused flagship generator at the
production inference shape: cumulative-prefix timing over the fused
layer list attributes where the end-to-end TFLOP/s goes (body convs vs
expansions vs tail), answering BENCH's inference-vs-body-conv gap.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_inference.py

Methodology: jit the first k fused layers for increasing k (one
remote compile each) and time with host value-fetch syncing; stage
time = difference of consecutive prefixes. Dispatch floor (~3 ms) is
amortized over 4 in-flight iterations.
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
from sup3r_tpu.utilities.flops import estimate_flops

_SSUM = jax.jit(jnp.sum)


def timed(fn, *args, n=4, reps=3):
    out = fn(*args)
    float(_SSUM(out))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(_SSUM(out))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main(batch=16):
    chunk = (batch, 20, 20, 24, 2)
    model = Sup3rGan(get_config('spatiotemporal/gen_3x_4x_2f'),
                     get_config('spatiotemporal/disc_test'))
    model.init_weights((1, *chunk[1:]), (1, 60, 60, 96, 2))
    layers, fparams = fuse_network(model.generator.layers,
                                   model.gen_params)
    params = jax.device_put(fparams)
    x = jnp.asarray(np.random.default_rng(0).random(chunk),
                    jnp.float32)

    names = [type(lyr).__name__ for lyr in layers]
    # cut points: after the two t-expansions (LR stage), at quarters
    # of the residual body, after the spatial expansion, before/after
    # the tail — ~9 prefixes = ~9 remote compiles
    exp_idx = [i + 1 for i, n in enumerate(names)
               if n == 'SpatioTemporalExpansion']
    body_start = exp_idx[1] if len(exp_idx) > 1 else 2
    body_end = exp_idx[-1] - 2 if len(exp_idx) > 2 else len(names) - 3
    quarters = [body_start + int(f * (body_end - body_start))
                for f in (0.25, 0.5, 0.75, 1.0)]
    cuts = sorted(set(
        exp_idx[:2] + quarters
        + [exp_idx[-1], len(layers) - 1, len(layers)]))

    prev_t, prev_fl = 0.0, 0.0
    print(f'{"prefix":>6s} {"stage layers":32s} {"t_ms":>8s} '
          f'{"dt_ms":>8s} {"GF":>8s} {"TFLOP/s":>8s}')
    last_cut = 0
    for cut in cuts:
        sub = Network(layers[:cut])
        fn = jax.jit(lambda p, a, net=sub: net.apply(
            p, a, allow_pending_skips=True))
        t = timed(fn, params[:cut], x)
        fl = estimate_flops(fn, params[:cut], x)
        dt = t - prev_t
        dfl = fl - prev_fl
        stage = ','.join(sorted(set(names[last_cut:cut])))
        rate = (dfl / dt / 1e12) if dt > 1e-5 else float('nan')
        print(f'{cut:6d} {stage[:32]:32s} {t * 1e3:8.2f} '
              f'{dt * 1e3:8.2f} {dfl / 1e9:8.1f} {rate:8.2f}')
        prev_t, prev_fl = t, fl
        last_cut = cut


if __name__ == '__main__':
    main(*(int(a) for a in sys.argv[1:]))
