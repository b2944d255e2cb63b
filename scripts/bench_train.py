"""Train-step benchmark on the real chip: fused GAN step (gen fwd/bwd +
disc fwd/bwd + both optimizer updates) latency for the flagship ST GAN.

Run: python scripts/bench_train.py [batch_size] [n_iters]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from sup3r_tpu.configs import get_config
from sup3r_tpu.models import Sup3rGan


def main(batch_size=16, n=20):
    lr_shape = (batch_size, 12, 12, 12, 2)
    hr_shape = (batch_size, 36, 36, 48, 2)
    model = Sup3rGan(get_config('spatiotemporal/gen_3x_4x_2f'),
                     get_config('spatiotemporal/disc_test'),
                     learning_rate=1e-4)
    model.init_weights((1, *lr_shape[1:]), (1, *hr_shape[1:]))
    rng = np.random.default_rng(0)
    lr = rng.random(lr_shape).astype(np.float32)
    hr = rng.random(hr_shape).astype(np.float32)

    # warmup/compile
    details = model.run_gradient_descent(lr, hr, train_gen=True,
                                         train_disc=True)
    t0 = time.perf_counter()
    for _ in range(n):
        details = model.run_gradient_descent(lr, hr, train_gen=True,
                                             train_disc=True)
    dt = (time.perf_counter() - t0) / n
    voxels = int(np.prod(hr_shape[:-1]))
    print(f'train step (batch {batch_size}): {dt * 1e3:.2f} ms '
          f'({voxels / dt:.3e} HR voxels/s) losses={details}')


if __name__ == '__main__':
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
