"""Autodiff-optimized reflect-pad-1 + valid-conv + activation block.

XLA differentiates ``jnp.pad(mode='reflect') -> conv`` into a conv plus
a chain of pad/rev/concat transposes that materialize full activation
tensors between every backward conv — measured ~1 ms/layer of pure
overhead on v5e at production train shapes (scripts/
bench_train_breakdown.py). This custom VJP computes the SAME forward
(bit-identical ops) but hands XLA a backward of one explicitly-padded
conv (the fast emitter path, same speed as forward) plus two 1-cell
halo fold-adds per spatial dim.

The input gradient of reflect-pad-1 is: inner cell ``i`` takes the
padded gradient at ``i+1``; cells 1 and S-2 additionally absorb the
halo gradients (reflection sends pad cells to them). The weight
gradient reuses XLA's native wgrad (measured fast) via ``jax.vjp`` on
the conv alone.

Replaces the hot portion of the backward pass of the reference's
FlexiblePadding(REFLECT)->Conv->Cropping blocks (reference:
sup3r/configs/spatiotemporal/gen_3x_4x_2f.json; TF GradientTape did
the equivalent work at sup3r/models/abstract.py:1190).
"""

import functools

import jax
import jax.numpy as jnp

__all__ = ['reflect_conv_ad', 'reflect_conv_shard_aligned',
           'shard_aligned_worthwhile']


def shard_aligned_worthwhile(spatial_width):
    """Whether the shard-aligned s1 formulation pays off on a spatial
    mesh axis of this width. THE policy gate, used by training
    (``_auto_shard_aligned``) and the inference runner alike: at sp2
    the reflect pad keeps s1 divisible, shard shifts are already
    1-row, and the boundary-correction plane broadcasts make the
    aligned path a net LOSS; from sp4 up it wins (~10x wire reduction
    at sp8 — scripts/scaling_study.py)."""
    return int(spatial_width) >= 4


def _dim_numbers(n_spatial):
    if n_spatial == 1:
        return ('NWC', 'WIO', 'NWC')
    if n_spatial == 2:
        return ('NHWC', 'HWIO', 'NHWC')
    return ('NDHWC', 'DHWIO', 'NDHWC')


def _check_k3(kernel, n_spatial):
    """Both custom backwards hard-code the k=3 transpose (dgrad pads
    (2,2); edge taps kernel[0]/kernel[2]) — any other kernel size
    would produce silently wrong gradients, so reject it at trace
    time (shapes are static under jit)."""
    taps = tuple(kernel.shape[:n_spatial])
    if taps != (3,) * n_spatial:
        raise ValueError(
            f'reflect_conv custom-VJP ops require a k=3 kernel on '
            f'every spatial dim; got spatial taps {taps} '
            f'(kernel shape {kernel.shape})')


def _fold_reflect_halos(gx, start_dim, n_spatial):
    """Exact transpose of the 1-cell reflect pad applied by
    ``_reflect_pad1(..., start_dim)``, one dim at a time: inner cell
    ``i`` takes the padded gradient at ``i+1``; cells 1 and S-2 absorb
    the reflected halo gradients. Halo slabs keep the other dims'
    padding so corner contributions compose exactly like the nested
    forward pads did. Shared by the plain and shard-aligned backward
    passes — the pad-index arithmetic must never desynchronize."""
    zero = jnp.asarray(0, gx.dtype)
    for d in range(start_dim, 1 + n_spatial):
        n = gx.shape[d]
        center = jax.lax.slice_in_dim(gx, 1, n - 1, axis=d)
        lo = jax.lax.slice_in_dim(gx, 0, 1, axis=d)
        hi = jax.lax.slice_in_dim(gx, n - 1, n, axis=d)
        m = center.shape[d]
        pad_lo = [(0, 0, 0)] * gx.ndim
        pad_lo[d] = (1, m - 2, 0)
        pad_hi = [(0, 0, 0)] * gx.ndim
        pad_hi[d] = (m - 2, 1, 0)
        gx = (center + jax.lax.pad(lo, zero, pad_lo)
              + jax.lax.pad(hi, zero, pad_hi))
    return gx


def _reflect_pad1(x, n_spatial, start_dim=1):
    """1-cell reflect pad of the spatial dims from ``start_dim`` on
    (same op sequence jnp.pad(mode='reflect') lowers to: slice +
    concat per dim)."""
    for d in range(start_dim, 1 + n_spatial):
        first = jax.lax.slice_in_dim(x, 1, 2, axis=d)
        last = jax.lax.slice_in_dim(x, x.shape[d] - 2, x.shape[d] - 1,
                                    axis=d)
        x = jnp.concatenate([first, x, last], axis=d)
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def reflect_conv_ad(x, kernel, bias, n_spatial, alpha):
    """reflect-pad-1 -> k3/s1 valid conv -> +bias -> LeakyReLU(alpha).

    ``alpha=None`` skips the activation. Forward numerics are identical
    to the unfused ``jnp.pad`` + ``conv_general_dilated`` sequence."""
    _check_k3(kernel, n_spatial)
    xp = _reflect_pad1(x, n_spatial)
    y = jax.lax.conv_general_dilated(
        xp, kernel, (1,) * n_spatial, 'VALID',
        dimension_numbers=_dim_numbers(n_spatial))
    y = y + bias
    if alpha is not None:
        y = jax.nn.leaky_relu(y, alpha)
    return y


def _pad_st(x, n_spatial):
    """1-cell reflect pad of the NON-sharded spatial dims only (s2..t;
    s1 / axis 1 is left alone so SPMD sharding stays aligned)."""
    return _reflect_pad1(x, n_spatial, start_dim=2)


def _sa_impl(x, kernel, bias, n_spatial, alpha):
    """Plain (autodiff-differentiable) shard-aligned forward; the
    numerics reference for the custom VJP below. Returns
    ``(out, pre_activation)``."""
    _check_k3(kernel, n_spatial)
    xp = _pad_st(x, n_spatial)
    pads = [(1, 1)] + [(0, 0)] * (n_spatial - 1)
    y = jax.lax.conv_general_dilated(
        xp, kernel, (1,) * n_spatial, pads,
        dimension_numbers=_dim_numbers(n_spatial))
    dn2 = _dim_numbers(n_spatial - 1)
    s1 = y.shape[1]

    def _edge(row, tap):
        t = jax.lax.conv_general_dilated(
            jax.lax.index_in_dim(xp, row, axis=1, keepdims=False),
            kernel[tap], (1,) * (n_spatial - 1), 'VALID',
            dimension_numbers=dn2)
        return t[:, None]

    zero_hi = [(0, 0, 0)] * y.ndim
    zero_hi[1] = (0, s1 - 1, 0)
    zero_lo = [(0, 0, 0)] * y.ndim
    zero_lo[1] = (s1 - 1, 0, 0)
    zval = jnp.asarray(0, y.dtype)
    pre = (y + jax.lax.pad(_edge(1, 0), zval, zero_hi)
           + jax.lax.pad(_edge(xp.shape[1] - 2, 2), zval, zero_lo)
           + bias)
    if alpha is not None:
        return jax.nn.leaky_relu(pre, alpha), pre
    return pre, pre


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def reflect_conv_shard_aligned(x, kernel, bias, n_spatial, alpha):
    """Same math as :func:`reflect_conv_ad` but SHARD-ALIGNED along
    the first spatial dim (s1): instead of reflect-padding s1 (which
    grows the global size by 2 and, under ``shard_spatial`` s1
    sharding, forces XLA's partitioner to re-balance shard boundaries
    at EVERY conv — measured 600 MB of multi-row shard shifts per
    device per generator application, scripts/scaling_study.py), s1
    is zero-padded INSIDE the conv (keeps the global size, so SPMD
    inserts true 1-row halo exchanges only) and the two boundary rows
    get local corrections restoring the reflect contribution:

        out[0]  += conv_{s2,t}(x[1],  kernel[s1_tap=0])
        out[-1] += conv_{s2,t}(x[-2], kernel[s1_tap=2])

    (zero padding contributed 0 where reflection contributes the
    mirrored row). Matches ``reflect_conv_ad`` up to fp32
    reassociation (~1e-6 — the boundary taps accumulate in a second
    add); the unsharded dims (s2, t) keep the exact reflect-pad
    sequence.

    Carries a custom VJP (same rationale as :func:`reflect_conv_ad`:
    kill XLA's reflect-pad transpose chain on s2/t) whose backward is
    ALSO shard-aligned on s1 — the dgrad conv keeps s1's (1, 1) zero
    padding (global size preserved -> true 1-row halos in the backward
    pass too) plus localized edge-row terms, so spatially-sharded
    TRAINING (dp x sp meshes) gets the same ~10x wire reduction as
    inference. Gradients match plain autodiff of the same forward to
    ~1e-6 (tests/forward_pass/test_shard_aligned_conv.py)."""
    return _sa_impl(x, kernel, bias, n_spatial, alpha)[0]


def _sa_fwd(x, kernel, bias, n_spatial, alpha):
    out, pre = _sa_impl(x, kernel, bias, n_spatial, alpha)
    return out, (x, kernel, pre if alpha is not None else None)


def _sa_bwd(n_spatial, alpha, res, dy):
    x, kernel, pre = res
    dn = _dim_numbers(n_spatial)
    dn2 = _dim_numbers(n_spatial - 1)
    if alpha is not None:
        dy = dy * jnp.where(pre >= 0, jnp.asarray(1.0, dy.dtype),
                            jnp.asarray(alpha, dy.dtype))
    dbias = jnp.sum(dy, axis=tuple(range(dy.ndim - 1)))
    xp = _pad_st(x, n_spatial)

    # dgrad of the main conv w.r.t. the s2/t-padded input: s1 keeps a
    # (1, 1) zero pad (transpose of the forward's in-conv zero pad —
    # global size preserved, so SPMD emits 1-row halos here too);
    # s2/t were VALID over the padded input so their transpose is
    # full (2, 2) padding
    kf = jnp.swapaxes(jnp.flip(kernel, axis=tuple(range(n_spatial))),
                      -2, -1)
    pads_bwd = [(1, 1)] + [(2, 2)] * (n_spatial - 1)
    gxp = jax.lax.conv_general_dilated(
        dy, kf, (1,) * n_spatial, pads_bwd, dimension_numbers=dn)

    # edge-correction dgrads: out[0] read xp[1] through kernel[0];
    # out[-1] read xp[-2] through kernel[2]
    sp2_axes = tuple(range(n_spatial - 1))
    kf0 = jnp.swapaxes(jnp.flip(kernel[0], axis=sp2_axes), -2, -1)
    kf2 = jnp.swapaxes(jnp.flip(kernel[2], axis=sp2_axes), -2, -1)
    pads2 = [(2, 2)] * (n_spatial - 1)
    g_top = jax.lax.conv_general_dilated(
        jax.lax.index_in_dim(dy, 0, axis=1, keepdims=False),
        kf0, (1,) * (n_spatial - 1), pads2,
        dimension_numbers=dn2)[:, None]
    g_bot = jax.lax.conv_general_dilated(
        jax.lax.index_in_dim(dy, dy.shape[1] - 1, axis=1,
                             keepdims=False),
        kf2, (1,) * (n_spatial - 1), pads2,
        dimension_numbers=dn2)[:, None]
    s1 = gxp.shape[1]
    pad_r1 = [(0, 0, 0)] * gxp.ndim
    pad_r1[1] = (1, s1 - 2, 0)
    pad_rm2 = [(0, 0, 0)] * gxp.ndim
    pad_rm2[1] = (s1 - 2, 1, 0)
    zero = jnp.asarray(0, gxp.dtype)
    gxp = (gxp + jax.lax.pad(g_top, zero, pad_r1)
           + jax.lax.pad(g_bot, zero, pad_rm2))

    # fold the s2/t reflect halos back (exact transpose of _pad_st)
    gx = _fold_reflect_halos(gxp, 2, n_spatial)

    # weight gradient: XLA's native wgrad for the main conv, plus the
    # two edge-tap contributions
    pads_fwd = [(1, 1)] + [(0, 0)] * (n_spatial - 1)
    _, conv_vjp = jax.vjp(
        lambda k: jax.lax.conv_general_dilated(
            xp, k, (1,) * n_spatial, pads_fwd, dimension_numbers=dn),
        kernel)
    dkernel, = conv_vjp(dy)
    xp1 = jax.lax.index_in_dim(xp, 1, axis=1, keepdims=False)
    xpm2 = jax.lax.index_in_dim(xp, xp.shape[1] - 2, axis=1,
                                keepdims=False)
    dy0 = jax.lax.index_in_dim(dy, 0, axis=1, keepdims=False)
    dym1 = jax.lax.index_in_dim(dy, dy.shape[1] - 1, axis=1,
                                keepdims=False)
    _, vjp_top = jax.vjp(
        lambda k: jax.lax.conv_general_dilated(
            xp1, k, (1,) * (n_spatial - 1), 'VALID',
            dimension_numbers=dn2), kernel[0])
    dk0, = vjp_top(dy0)
    _, vjp_bot = jax.vjp(
        lambda k: jax.lax.conv_general_dilated(
            xpm2, k, (1,) * (n_spatial - 1), 'VALID',
            dimension_numbers=dn2), kernel[2])
    dk2, = vjp_bot(dym1)
    dkernel = dkernel.at[0].add(dk0).at[2].add(dk2)
    return gx, dkernel, dbias


reflect_conv_shard_aligned.defvjp(_sa_fwd, _sa_bwd)


def _fwd(x, kernel, bias, n_spatial, alpha):
    _check_k3(kernel, n_spatial)
    xp = _reflect_pad1(x, n_spatial)
    pre = jax.lax.conv_general_dilated(
        xp, kernel, (1,) * n_spatial, 'VALID',
        dimension_numbers=_dim_numbers(n_spatial))
    pre = pre + bias
    y = jax.nn.leaky_relu(pre, alpha) if alpha is not None else pre
    return y, (x, kernel, pre if alpha is not None else None)


def _bwd(n_spatial, alpha, res, dy):
    x, kernel, pre = res
    dn = _dim_numbers(n_spatial)
    if alpha is not None:
        # jax.nn.leaky_relu is where(x >= 0, x, alpha*x); match its
        # subgradient at exactly 0
        dy = dy * jnp.where(pre >= 0, jnp.asarray(1.0, dy.dtype),
                            jnp.asarray(alpha, dy.dtype))
    dbias = jnp.sum(dy, axis=tuple(range(dy.ndim - 1)))

    # input gradient: one full-padding conv with the spatially-flipped
    # IO-swapped kernel gives the gradient w.r.t. the PADDED input;
    # fold the 1-cell halo back through the reflection
    kf = jnp.swapaxes(jnp.flip(kernel, axis=tuple(range(n_spatial))),
                      -2, -1)
    gxp = jax.lax.conv_general_dilated(
        dy, kf, (1,) * n_spatial, [(2, 2)] * n_spatial,
        dimension_numbers=dn)
    gx = _fold_reflect_halos(gxp, 1, n_spatial)

    # weight gradient: XLA's native wgrad on the padded input
    xp = _reflect_pad1(x, n_spatial)
    _, conv_vjp = jax.vjp(
        lambda k: jax.lax.conv_general_dilated(
            xp, k, (1,) * n_spatial, 'VALID', dimension_numbers=dn),
        kernel)
    dkernel, = conv_vjp(dy)
    return gx, dkernel, dbias


reflect_conv_ad.defvjp(_fwd, _bwd)
