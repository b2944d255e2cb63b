"""64->72 pre-expansion conv ablation (VERDICT r4 #9): the only hot
stage never given the attack-or-document treatment. It runs ~29
TFLOP/s vs the body's 37-40 (docs/PERFORMANCE.md op-mix table) — the
72 output channels pad to 128 MXU lanes, so the naive efficiency bound
is 72/128 = 56%; XLA already beats that.

Measured attacks:
  v0  baseline: fused reflect conv 64->72 + LeakyReLU + depth-to-space
  v1  lane-fill: pad the kernel to co=128 (full lanes), slice to 72
      after — 1.78x the FLOPs; wins only if the lane padding (not the
      math) dominates
  v2  split: co=64 (full-lane) + co=8 convs, concat — the 64-lane
      part can run at body speed, the 8-lane remainder is lane-bound

Timing: value-fetch sync (block_until_ready unreliable on the
tunneled axon backend), best of 3 blocks of 10.

Run: PYTHONPATH=/root/repo:/root/.axon_site python
     scripts/bench_expansion_conv.py
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sup3r_tpu.ops.conv_ad import reflect_conv_ad

    rng = np.random.default_rng(0)
    # the flagship's pre-expansion stage shape: batch 16 of padded
    # chunks, t already expanded 4x, spatial still LR
    x = jax.device_put(rng.standard_normal(
        (16, 20, 20, 96, 64)).astype(np.float32))
    k = jax.device_put((rng.standard_normal(
        (3, 3, 3, 64, 72)) * 0.05).astype(np.float32))
    b = jax.device_put(np.zeros(72, np.float32))
    k128 = jnp.pad(k, ((0, 0),) * 4 + ((0, 56),))
    b128 = jnp.pad(b, (0, 56))
    ssum = jax.jit(jnp.sum)

    def d2s(y):
        # spatial_mult=3 pixel shuffle: (n, s1, s2, t, 9*c) ->
        # (n, 3 s1, 3 s2, t, c)
        n, s1, s2, t, c = y.shape
        m, co = 3, c // 9
        y = y.reshape(n, s1, s2, t, m, m, co)
        y = y.transpose(0, 1, 4, 2, 5, 3, 6)
        return y.reshape(n, s1 * m, s2 * m, t, co)

    @jax.jit
    def v0(x, k, b):
        return d2s(reflect_conv_ad(x, k, b, 3, 0.2))

    @jax.jit
    def v1(x, k128, b128):
        y = reflect_conv_ad(x, k128, b128, 3, 0.2)[..., :72]
        return d2s(y)

    k64, k8 = k[..., :64], k[..., 64:]
    b64, b8 = b[:64], b[64:]

    @jax.jit
    def v2(x, k64, b64, k8, b8):
        a = reflect_conv_ad(x, k64, b64, 3, 0.2)
        c = reflect_conv_ad(x, k8, b8, 3, 0.2)
        return d2s(jnp.concatenate([a, c], axis=-1))

    flops = 2 * 27 * 64 * 72 * int(np.prod(x.shape[:4]))

    def timeit(name, fn, *args):
        out = fn(*args)
        float(ssum(out))  # warm + sync
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                out = fn(*args)
            float(ssum(out))
            best = min(best, (time.perf_counter() - t0) / 10)
        print(f'{name}: {best * 1e3:.2f} ms, '
              f'{flops / best / 1e12:.1f} TFLOP/s (useful-FLOP basis)',
              flush=True)
        return best

    t0_ = timeit('v0 baseline 64->72 + d2s', v0, x, k, b)
    t1 = timeit('v1 lane-fill co=128 + slice', v1, x, k128, b128)
    t2 = timeit('v2 split 64+8 concat', v2, x, k64, b64, k8, b8)
    best = min(t1, t2)
    print(f'best attack vs baseline: {t0_ / best:.3f}x', flush=True)


if __name__ == '__main__':
    sys.exit(main())
