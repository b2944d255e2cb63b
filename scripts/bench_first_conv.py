"""Ablate formulations of the generator's FIRST conv (2->64 at LR).

The inference op-mix profile (docs/PERFORMANCE.md) shows the first
reflect-conv running at 0.13 TFLOP/s (~5 ms isolated at the production
shape) because XLA's conv emitter pads the 2-channel contraction to
128 lanes. Previous attacks (HBM im2col, VMEM patch-matmul, 27-tap
einsums) all lost — but the tail conv's winning VPU formulation
(scalar-weight shifted FMAs, ops/pallas_kernels.py small_reflect_conv)
was never tried INVERTED for the wide-output endpoint. This script
measures two new Pallas variants against XLA and the MXU Pallas
kernel on the real chip:

  A. XLA reflect+conv (the production path today)
  B. existing MXU Pallas ``reflect_conv`` (27 shifted (N,2)@(2,64))
  C. co-major VPU kernel: acc (CO, H, W, T), weight sublane-broadcast
  D. co-lanes VPU kernel: acc (H, W, T, CO), input with singleton lane
     dim so each shifted window lane-splats against a (1, CO) weight row

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_first_conv.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sup3r_tpu.ops.pallas_kernels import reflect_conv, reflect_conv_reference

_SSUM = jax.jit(jnp.sum)


def timeit(fn, args, n=20, reps=3):
    out = fn(*args)
    float(_SSUM(out))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(_SSUM(out))
        best = min(best, (time.perf_counter() - t0) / n)
    return best, out


# ---------------------------------------------------------------- C
def _comajor_kernel(x_ref, k_ref, o_ref, *, H, W, T, CI, CO):
    # x_ref (1, CI, H+2, W+2, T+2); k_ref (27*CI, CO); o (1, CO, H, W, T)
    acc = jnp.zeros((CO, H, W, T), jnp.float32)
    for tap in range(27):
        dh, dw, dt = tap // 9, (tap // 3) % 3, tap % 3
        for ci in range(CI):
            win = x_ref[0, ci, dh:dh + H, dw:dw + W, dt:dt + T]
            wv = k_ref[tap * CI + ci]  # (CO,)
            acc = acc + wv[:, None, None, None] * win[None]
    o_ref[0] = acc


def wide_conv_comajor(x, kernel, bias):
    B, H, W, T, CI = x.shape
    CO = kernel.shape[-1]
    xt = jnp.transpose(x, (0, 4, 1, 2, 3))
    xp = jnp.pad(xt, ((0, 0), (0, 0), (1, 1), (1, 1), (1, 1)),
                 mode='reflect')
    # (3,3,3,CI,CO) -> (27*CI, CO) rows in tap-major, ci-minor order
    kt = kernel.reshape(27, CI, CO).reshape(27 * CI, CO)
    out = pl.pallas_call(
        functools.partial(_comajor_kernel, H=H, W=W, T=T, CI=CI, CO=CO),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, CI, H + 2, W + 2, T + 2),
                         lambda b: (b, 0, 0, 0, 0)),
            pl.BlockSpec((27 * CI, CO), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, CO, H, W, T),
                               lambda b: (b, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, CO, H, W, T), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, kt)
    return jnp.transpose(out, (0, 2, 3, 4, 1)) + bias


# ---------------------------------------------------------------- D
def _colanes_kernel(x_ref, k_ref, o_ref, *, H, W, T, CI, CO):
    # x_ref (1, 1, H+2, W+2, T+2, 1); k_ref (1, 27, 1, CO); grid (B, CI)
    ci = pl.program_id(1)
    acc = jnp.zeros((H, W, T, CO), jnp.float32)
    for tap in range(27):
        dh, dw, dt = tap // 9, (tap // 3) % 3, tap % 3
        win = x_ref[0, 0, dh:dh + H, dw:dw + W, dt:dt + T, :]
        wv = jnp.broadcast_to(k_ref[0, tap].reshape(1, 1, 1, CO),
                              (H, W, T, CO))
        acc = acc + jnp.broadcast_to(win, (H, W, T, CO)) * wv
    new = acc[None]

    @pl.when(ci == 0)
    def _init():
        o_ref[...] = new

    @pl.when(ci != 0)
    def _acc():
        o_ref[...] += new


def wide_conv_colanes(x, kernel, bias):
    B, H, W, T, CI = x.shape
    CO = kernel.shape[-1]
    xt = jnp.transpose(x, (0, 4, 1, 2, 3))
    xp = jnp.pad(xt, ((0, 0), (0, 0), (1, 1), (1, 1), (1, 1)),
                 mode='reflect')[..., None]
    # ci-major rows so block ci selects that channel's 27 tap rows
    kt = jnp.transpose(kernel.reshape(27, CI, CO),
                       (1, 0, 2))[:, :, None, :]
    out = pl.pallas_call(
        functools.partial(_colanes_kernel, H=H, W=W, T=T, CI=CI, CO=CO),
        grid=(B, CI),
        in_specs=[
            pl.BlockSpec((1, 1, H + 2, W + 2, T + 2, 1),
                         lambda b, ci: (b, ci, 0, 0, 0, 0)),
            pl.BlockSpec((1, 27, 1, CO), lambda b, ci: (ci, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, W, T, CO),
                               lambda b, ci: (b, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, T, CO), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary'),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, kt)
    return out + bias


def main(n=20):
    B, H, W, T, CI, CO = 16, 20, 20, 24, 2, 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, T, CI)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, CI, CO)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal(CO), jnp.float32)
    gflop = 2 * B * H * W * T * 27 * CI * CO / 1e9

    # float64 ground truth (pure numpy) for exactness claims
    xp64 = np.pad(np.asarray(x, np.float64),
                  ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)),
                  mode='reflect')
    truth = np.zeros((B, H, W, T, CO))
    for dh in range(3):
        for dw in range(3):
            for dt in range(3):
                win = xp64[:, dh:dh + H, dw:dw + W, dt:dt + T, :]
                truth += win @ np.asarray(k, np.float64)[dh, dw, dt]
    truth += np.asarray(b, np.float64)

    def report(name, fn):
        try:
            t, out = timeit(fn, (x, k, b), n)
        except Exception as e:  # noqa: BLE001
            print(f'{name:28s} FAILED: {type(e).__name__}: '
                  f'{str(e)[:200]}')
            return
        err = float(np.abs(np.asarray(out, np.float64) - truth).max())
        print(f'{name:28s} {t * 1e3:8.3f} ms  {gflop / t / 1e3:6.2f} '
              f'TFLOP/s  max|err| vs f64 {err:.2e}')

    report('XLA reflect+conv',
           jax.jit(lambda a, kk, bb: reflect_conv_reference(a, kk, bb)))
    report('MXU pallas reflect_conv',
           lambda a, kk, bb: reflect_conv(a, kk, bb))
    report('VPU co-major (C)', jax.jit(wide_conv_comajor))
    report('VPU co-lanes (D)', jax.jit(wide_conv_colanes))


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
