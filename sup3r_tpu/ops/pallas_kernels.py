"""Pallas TPU kernels for the hot generator blocks.

The shipped generator configs are stacks of
``FlexiblePadding(reflect) -> Conv(k3, s1) -> Cropping -> LeakyReLU``
units (reference: sup3r/configs/*/*.json). Composed naively, XLA
materializes the reflect-padded tensor in HBM before every conv —
for pad 3 on three dims that inflates a (12, 12, 12) chunk ~3.4x in
HBM traffic, and the pad/crop/activation each cost extra HBM round
trips.

``reflect_conv`` computes the mathematically-equal fused op — k=3
stride-1 convolution with 1-pixel reflect boundary + bias + LeakyReLU —
in ONE kernel: the whole (small) chunk lives in VMEM, reflect halo is
built in VMEM scratch, and the conv runs as 9/27 shifted MXU matmuls.

Equivalence (net shape): pad 3 (+6), conv k3 valid (-2), crop 2 (-4)
==> output pixel i sees input window [i-1, i+1] with reflect BC.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _reflect_pad_scratch(x, scratch, n_spatial):
    """Fill scratch (each spatial dim +2) with x + 1-pixel reflect
    halo. scratch/x are VMEM values-by-ref; returns nothing."""
    if n_spatial == 2:
        h, w, c = x.shape
        scratch[1:h + 1, 1:w + 1, :] = x[:]
        # reflect rows then cols (corners resolved by the col pass)
        scratch[0, 1:w + 1, :] = x[1, :, :]
        scratch[h + 1, 1:w + 1, :] = x[h - 2, :, :]
        scratch[:, 0, :] = scratch[:, 2, :]
        scratch[:, w + 1, :] = scratch[:, w - 1, :]
    else:
        d, h, w, c = x.shape
        scratch[1:d + 1, 1:h + 1, 1:w + 1, :] = x[:]
        scratch[0, 1:h + 1, 1:w + 1, :] = x[1, :, :, :]
        scratch[d + 1, 1:h + 1, 1:w + 1, :] = x[d - 2, :, :, :]
        scratch[:, 0, 1:w + 1, :] = scratch[:, 2, 1:w + 1, :]
        scratch[:, h + 1, 1:w + 1, :] = scratch[:, h - 1, 1:w + 1, :]
        scratch[:, :, 0, :] = scratch[:, :, 2, :]
        scratch[:, :, w + 1, :] = scratch[:, :, w - 1, :]


def _reflect_conv_kernel_3d(x_ref, w_ref, b_ref, o_ref, scratch,
                            acc_ref, *, alpha):
    d, h, w, c_in = x_ref.shape[1:]
    c_out = w_ref.shape[-1]
    _reflect_pad_scratch(x_ref[0], scratch, 3)
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for k in range(27):
        dz, dy, dx = k // 9, (k // 3) % 3, k % 3
        window = scratch[dz:dz + d, dy:dy + h, dx:dx + w, :]
        acc_ref[:] += jnp.dot(window.reshape(d * h * w, c_in),
                              w_ref[k],
                              preferred_element_type=jnp.float32)
    acc = acc_ref[:] + b_ref[0]
    if alpha is not None:
        acc = jnp.where(acc >= 0, acc, alpha * acc)
    o_ref[0] = acc.reshape(d, h, w, c_out).astype(o_ref.dtype)


def _reflect_conv_kernel_2d(x_ref, w_ref, b_ref, o_ref, scratch,
                            acc_ref, *, alpha):
    h, w, c_in = x_ref.shape[1:]
    c_out = w_ref.shape[-1]
    _reflect_pad_scratch(x_ref[0], scratch, 2)
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for k in range(9):
        dy, dx = k // 3, k % 3
        window = scratch[dy:dy + h, dx:dx + w, :]
        acc_ref[:] += jnp.dot(window.reshape(h * w, c_in), w_ref[k],
                              preferred_element_type=jnp.float32)
    acc = acc_ref[:] + b_ref[0]
    if alpha is not None:
        acc = jnp.where(acc >= 0, acc, alpha * acc)
    o_ref[0] = acc.reshape(h, w, c_out).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('alpha',))
def reflect_conv(x, kernel, bias, alpha=None):
    """Fused reflect-boundary k3/s1 conv + bias + optional LeakyReLU.

    x: (n, s1, s2[, t], c_in); kernel: (3, 3[, 3], c_in, c_out);
    bias: (c_out,); alpha: LeakyReLU negative slope or None.
    Output has the same spatial shape as x with c_out channels.
    """
    n_spatial = x.ndim - 2
    assert n_spatial in (2, 3), f'Bad input rank {x.ndim}'
    n = x.shape[0]
    c_in, c_out = kernel.shape[-2], kernel.shape[-1]
    taps = 3 ** n_spatial
    w2d = kernel.reshape(taps, c_in, c_out)
    b2d = bias.reshape(1, c_out)
    spatial = x.shape[1:-1]
    out_shape = jax.ShapeDtypeStruct((n, *spatial, c_out), x.dtype)
    scratch_shape = tuple(s + 2 for s in spatial) + (c_in,)
    kernel_fn = (_reflect_conv_kernel_3d if n_spatial == 3
                 else _reflect_conv_kernel_2d)
    block = (1, *spatial, c_in)
    idx_map = ((lambda i: (i, 0, 0, 0, 0)) if n_spatial == 3
               else (lambda i: (i, 0, 0, 0)))
    out_idx = idx_map
    return pl.pallas_call(
        functools.partial(kernel_fn, alpha=alpha),
        grid=(n,),
        in_specs=[
            pl.BlockSpec(block, idx_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((taps, c_in, c_out), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, *spatial, c_out), out_idx,
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM(scratch_shape, jnp.float32),
            pltpu.VMEM((int(np.prod(spatial)), c_out), jnp.float32),
        ],
    )(x, w2d, b2d)


def reflect_conv_reference(x, kernel, bias, alpha=None):
    """Unfused XLA reference of the same op (pad/conv/crop/act) for
    correctness checks and fallback."""
    n_spatial = x.ndim - 2
    pad = [(0, 0)] + [(1, 1)] * n_spatial + [(0, 0)]
    xp = jnp.pad(x, pad, mode='reflect')
    dn = (('NHWC', 'HWIO', 'NHWC') if n_spatial == 2
          else ('NDHWC', 'DHWIO', 'NDHWC'))
    y = jax.lax.conv_general_dilated(
        xp, kernel, (1,) * n_spatial, 'VALID', dimension_numbers=dn)
    y = y + bias
    if alpha is not None:
        y = jax.nn.leaky_relu(y, alpha)
    return y


def _small_conv_kernel(x_ref, k_ref, o_ref, *, H, W, T, CO):
    """One (batch, in-channel) grid step: this channel's 27 shifted
    FMA taps accumulate in LOCAL accumulators (VMEM scratch), with one
    output read-modify-write at the end. TPU grid steps run
    sequentially, so accumulating across the CI grid axis is safe."""
    ci = pl.program_id(1)
    x = x_ref[0, 0]  # (H+2, W+2, T+2) for this (b, ci)
    accs = [jnp.zeros((H, W, T), x.dtype) for _ in range(CO)]
    for dh in range(3):
        for dw in range(3):
            part = x[dh:dh + H, dw:dw + W, :]
            for dt in range(3):
                sl = part[:, :, dt:dt + T]
                for co in range(CO):
                    accs[co] = accs[co] + k_ref[0, dh, dw, dt, 0,
                                                co] * sl
    new = jnp.stack(accs, axis=2)[None]  # (1, H, W, CO, T)

    @pl.when(ci == 0)
    def _init():
        o_ref[...] = new

    @pl.when(ci != 0)
    def _acc():
        o_ref[...] += new


def small_reflect_conv(x, kernel, bias, alpha=None):
    """Reflect-pad-1 + k3 conv + bias(+LeakyReLU) specialized for TINY
    channel counts (e.g. the flagship generator's final 8->2 conv at
    HR resolution, reference config
    sup3r/configs/spatiotemporal/gen_3x_4x_2f.json tail).

    XLA's conv emitter pads the 8-channel lane dim to 128 and runs
    this 2.4 GFLOP op in ~14 ms; shifted-einsum XLA variants re-read
    the input 27 times (~9 ms). This kernel keeps time in the lane
    dim, reads the input once per in-channel, and accumulates the 27
    taps in VMEM: measured ~1-2 ms for the same op, bit-comparable at
    fp32 tap ordering.

    Differentiable: a custom VJP computes input/kernel gradients as
    XLA convs (full-padding flipped-kernel dgrad + native wgrad; the
    reflect-pad and transposes around the kernel use JAX's native
    autodiff), so the kernel is usable inside jitted train steps.

    x: (B, H, W, T, CI) float32; kernel: (3, 3, 3, CI, CO)."""
    # time into lanes: (B, H, W, T, CI) -> (B, CI, H, W, T)
    xt = jnp.transpose(x, (0, 4, 1, 2, 3))
    xp = jnp.pad(xt, ((0, 0), (0, 0), (1, 1), (1, 1), (1, 1)),
                 mode='reflect')
    # kernel per in-channel: (CI, 3, 3, 3, 1, CO)
    kt = jnp.transpose(kernel, (3, 0, 1, 2, 4))[:, :, :, :, None, :]
    out = _small_conv_core(xp, kt)
    y = jnp.transpose(out, (0, 1, 2, 4, 3)) + bias
    if alpha is not None:
        y = jax.nn.leaky_relu(y, alpha)
    return y


@jax.custom_vjp
def _small_conv_core(xp, kt):
    """VALID k3 conv on the padded, time-in-lanes layout:
    xp (B, CI, H+2, W+2, T+2), kt (CI, 3, 3, 3, 1, CO) ->
    (B, H, W, CO, T)."""
    B, CI = xp.shape[:2]
    H, W, T = (s - 2 for s in xp.shape[2:])
    CO = kt.shape[-1]
    return pl.pallas_call(
        functools.partial(_small_conv_kernel, H=H, W=W, T=T, CO=CO),
        grid=(B, CI),
        in_specs=[
            pl.BlockSpec((1, 1, H + 2, W + 2, T + 2),
                         lambda b, ci: (b, ci, 0, 0, 0)),
            pl.BlockSpec((1, 3, 3, 3, 1, CO),
                         lambda b, ci: (ci, 0, 0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, W, CO, T),
                               lambda b, ci: (b, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, CO, T), xp.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary'),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, kt)


def _small_conv_fwd(xp, kt):
    return _small_conv_core(xp, kt), (xp, kt)


def _small_conv_bwd(res, g):
    """Conv-formulated adjoints: the earlier shifted-einsum version
    re-read the input 27 times and measured ~90 ms/step at train
    shapes — expressing dgrad as one full-padding conv with the
    flipped kernel and wgrad as XLA's native conv wgrad runs the
    whole backward in ~4 ms (same fast emitter path the forward conv
    uses; see ops/conv_ad.py for the same pattern)."""
    xp, kt = res
    dn = ('NDHWC', 'DHWIO', 'NDHWC')
    # std layouts: g (B, H, W, CO, T) -> (B, H, W, T, CO);
    # xp (B, CI, H+2, W+2, T+2) -> (B, H+2, W+2, T+2, CI);
    # kt (CI, 3, 3, 3, 1, CO) -> kernel (3, 3, 3, CI, CO)
    g_std = jnp.transpose(g, (0, 1, 2, 4, 3))
    xp_std = jnp.transpose(xp, (0, 2, 3, 4, 1))
    kernel = jnp.transpose(kt[:, :, :, :, 0, :], (1, 2, 3, 0, 4))

    kflip = jnp.swapaxes(jnp.flip(kernel, axis=(0, 1, 2)), -2, -1)
    dxp_std = jax.lax.conv_general_dilated(
        g_std, kflip, (1, 1, 1), [(2, 2)] * 3, dimension_numbers=dn)
    dxp = jnp.transpose(dxp_std, (0, 4, 1, 2, 3))

    _, conv_vjp = jax.vjp(
        lambda k: jax.lax.conv_general_dilated(
            xp_std, k, (1, 1, 1), 'VALID', dimension_numbers=dn),
        kernel)
    dkernel, = conv_vjp(g_std)
    dkt = jnp.transpose(dkernel, (3, 0, 1, 2, 4))[:, :, :, :, None, :]
    return dxp, dkt


_small_conv_core.defvjp(_small_conv_fwd, _small_conv_bwd)
