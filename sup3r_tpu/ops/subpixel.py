"""Subpixel tail convolution: fold a k3 reflect-conv that follows a
pixel-shuffle spatial expansion back to PRE-expansion resolution.

The flagship generators end with ``SpatioTemporalExpansion(spatial m)
-> LeakyReLU -> FlexiblePadding/Conv/Crop`` (reference config
sup3r/configs/spatiotemporal/gen_3x_4x_2f.json tail): a tiny-channel
conv at HR resolution that starves both the MXU (2 output lanes) and
the VPU path. Algebra: with ``x = depth_to_space(z, m)``, HR output
pixel ``(m*i+p, m*j+q)`` reads HR rows ``m*i+p+dh`` which live in LR
cell ``i + (p+dh)//m`` at phase ``(p+dh) % m`` — so the whole tail is
ONE k3 conv over ``z`` with a block-sparse ``(m^2*C, m^2*co)`` kernel
(phases scattered into channel blocks), followed by depth_to_space of
the ``m^2*co`` outputs. The HR reflect boundary becomes phase-permuted
halo cells of ``z`` (HR index -1 reflects to +1 = phase 1 of cell 0).

FLOPs rise m^2-fold (the kernel is 1/m^2 dense) but run on the MXU at
72 input channels instead of 8 — measured ~4x faster end to end than
the HR-resolution Pallas VPU kernel on v5e (see docs/PERFORMANCE.md).
"""

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ['subpixel_tail_conv', 'build_subpixel_kernel']


def build_subpixel_kernel(kernel, m):
    """Scatter an HR (3, 3, 3, C, co) tail kernel into the
    pre-expansion (3, 3, 3, m*m*C, m*m*co) block-sparse kernel.

    Channel layout matches TF depth_to_space: HR pixel
    (m*i+p, m*j+q, c) == z[i, j, (p*m+q)*C + c]. Built with traceable
    jnp updates so gradients flow back to the HR kernel in training.
    Each (p, dh) pair maps to a distinct (cell offset, input phase),
    so the static .set() scatters never collide."""
    kh, kw, kt, ci, co = kernel.shape
    assert (kh, kw, kt) == (3, 3, 3), 'k3 tails only'
    K = jnp.zeros((3, 3, 3, m * m * ci, m * m * co), kernel.dtype)
    for p in range(m):          # output phase rows
        for q in range(m):      # output phase cols
            for dh in (-1, 0, 1):
                di = (p + dh) // m
                p_in = (p + dh) % m
                for dw in (-1, 0, 1):
                    dj = (q + dw) // m
                    q_in = (q + dw) % m
                    ib = (p_in * m + q_in) * ci
                    ob = (p * m + q) * co
                    K = K.at[di + 1, dj + 1, :, ib:ib + ci,
                             ob:ob + co].set(kernel[dh + 1, dw + 1])
    return K


def _phase_reflect_pad(z, m, ci):
    """Pad z's two spatial dims by one cell each side with
    phase-remapped reflections (HR reflect-pad-1 in z space), and the
    time dim by plain reflect (time carries no phase)."""

    def permute_rows(cell, axis_phase):
        """Move phase 1 of the given spatial axis into the phase slot
        the halo is read at (2 on the low side, 0 on the high side).
        Unread phase blocks just carry copies (their kernel weights
        are zero)."""
        b, s1, s2, t, _ = cell.shape
        blocks = jnp.reshape(cell, (b, s1, s2, t, m, m, ci))
        if axis_phase == 'row_low':     # x[-1] = x[1] -> p:2 <- p=1
            sel = blocks[..., 1:2, :, :]
            out = jnp.concatenate([sel] * m, axis=-3)
        elif axis_phase == 'row_high':  # x[mS] = x[mS-2] -> p:0 <- p=1
            sel = blocks[..., m - 2:m - 1, :, :]
            out = jnp.concatenate([sel] * m, axis=-3)
        elif axis_phase == 'col_low':
            sel = blocks[..., :, 1:2, :]
            out = jnp.concatenate([sel] * m, axis=-2)
        else:                            # col_high
            sel = blocks[..., :, m - 2:m - 1, :]
            out = jnp.concatenate([sel] * m, axis=-2)
        return jnp.reshape(out, cell.shape)

    lo = permute_rows(z[:, 0:1], 'row_low')
    hi = permute_rows(z[:, -1:], 'row_high')
    z = jnp.concatenate([lo, z, hi], axis=1)
    lo = permute_rows(z[:, :, 0:1], 'col_low')
    hi = permute_rows(z[:, :, -1:], 'col_high')
    z = jnp.concatenate([lo, z, hi], axis=2)
    # plain reflect on time
    z = jnp.concatenate(
        [z[:, :, :, 1:2], z, z[:, :, :, -2:-1]], axis=3)
    return z


def subpixel_tail_conv(z, kernel, bias, m, alpha_prev=None,
                       alpha=None, precision='highest'):
    """LeakyReLU(alpha_prev) -> depth_to_space(m) -> reflect-pad-1 ->
    k3 valid conv(kernel, bias) -> LeakyReLU(alpha), computed at
    PRE-expansion resolution.

    z: (B, S1, S2, T, m*m*C); kernel: (3, 3, 3, C, co) the HR tail
    kernel. Returns (B, m*S1, m*S2, T, co). ``precision='highest'``
    keeps fp32-equivalent accuracy (the conv runs on bf16 passes
    otherwise under this platform's --xla_allow_excess_precision)."""
    ci, co = kernel.shape[-2:]
    assert m >= 2, (
        'subpixel_tail_conv needs a real expansion (m >= 2); m == 1 '
        'is just reflect_conv_reference')
    assert z.shape[-1] == m * m * ci, (z.shape, m, ci)
    if alpha_prev is not None:
        z = jax.nn.leaky_relu(z, alpha_prev)
    K = build_subpixel_kernel(kernel, m)
    zp = _phase_reflect_pad(z, m, ci)
    y = jax.lax.conv_general_dilated(
        zp, K.astype(z.dtype), (1, 1, 1), 'VALID',
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'),
        precision=precision)
    y = y + jnp.tile(bias.astype(z.dtype), m * m)
    # interleave output phases back to HR: (B,S1,S2,T,m*m*co) ->
    # (B, m*S1, m*S2, T, co), TF depth_to_space ordering
    b, s1, s2, t, _ = y.shape
    y = jnp.reshape(y, (b, s1, s2, t, m, m, co))
    y = jnp.transpose(y, (0, 1, 4, 2, 5, 3, 6))
    y = jnp.reshape(y, (b, s1 * m, s2 * m, t, co))
    if alpha is not None:
        y = jax.nn.leaky_relu(y, alpha)
    return y
