"""Mixed-precision (bf16-body) train-step ablation (VERDICT r4 #7):
time the fused GAN step with ``train_dtype='bfloat16'`` (bf16
generator+discriminator forward/backward, fp32 master weights +
optimizer + losses) against the fp32 default at bench shapes.

Context: inference bf16 measured only 1.07-1.26x at these shapes —
the body convs already run with bf16-rounded inputs on this TPU
(--xla_allow_excess_precision), so casting mainly saves activation
bandwidth. Training has never been measured (reference trains fp32 TF,
sup3r/models/abstract.py:1190).

Run: PYTHONPATH=/root/repo:/root/.axon_site python
     scripts/bench_train_bf16.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_train_production_disc import time_step  # noqa: E402


def main():
    from sup3r_tpu.configs import get_config
    from sup3r_tpu.models import Sup3rGan

    cases = [
        ('bench shape', 'spatiotemporal/disc_test', 16,
         (12, 12, 12), (36, 36, 48)),
        # production-shaped sample with the real 'valid' disc (see
        # bench_train_production_disc.py for the shape constraints)
        ('production shape', 'spatiotemporal/disc', 4,
         (24, 24, 18), (72, 72, 72)),
    ]
    for label, disc_name, tb, tlr, thr in cases:
        results = {}
        for dt in (None, 'bfloat16'):
            model = Sup3rGan(get_config('spatiotemporal/gen_3x_4x_2f'),
                             get_config(disc_name),
                             learning_rate=1e-4)
            model.train_dtype = dt
            t, vps, tflops = time_step(model, tb, tlr, thr)
            results[dt or 'fp32'] = t
            tf = f'{tflops:.1f}' if tflops else '?'
            print(f'[{label}] train_dtype={dt or "fp32 (default)"}: '
                  f'{t * 1e3:.1f} ms/step, {vps:.3g} HR voxels/s, '
                  f'{tf} TFLOP/s', flush=True)
        speedup = results['fp32'] / results['bfloat16']
        print(f'[{label}] bf16 speedup vs fp32: {speedup:.3f}x',
              flush=True)


if __name__ == '__main__':
    sys.exit(main())
