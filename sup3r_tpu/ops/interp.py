"""Spatiotemporal and vertical-level interpolation.

Reference parity: sup3r/models/utilities.py:161 (st_interp),
sup3r/utilities/interpolation.py:17-233 (Interpolator: level masks,
linear/log vertical interpolation).
"""

import numpy as np

from sup3r_tpu.ops._dispatch import array_module


def _axis_points(n, offset=True):
    """Cell-centered sample positions of n points in a (0, 10) span.

    Built as ``arange(n) * (10/n)`` — ``np.arange(0, 10, 10/n)``
    returns n+1 points when 10/n rounds down (n = 61, 77, 122, ...),
    which silently mis-sized st_interp output (the reference's
    RegularGridInterpolator crashes loudly on the same arange;
    round-3 review finding)."""
    pts = np.arange(n) * (10 / n)
    return pts + 5 / n if offset else pts


def _interp1d_weights(src, dst, xp):
    """For each dst position return (lo_idx, hi_idx, alpha) for linear
    interpolation with linear extrapolation beyond the src endpoints."""
    src = np.asarray(src)
    # index of the left neighbor, clamped so (lo, lo+1) is always valid
    lo = np.searchsorted(src, dst) - 1
    lo = np.clip(lo, 0, len(src) - 2)
    hi = lo + 1
    alpha = (dst - src[lo]) / (src[hi] - src[lo])
    return lo, hi, xp.asarray(alpha)


def _lerp_axis(xp, arr, lo, hi, alpha, axis):
    """Gather-and-lerp one axis onto (lo, hi, alpha) query weights —
    the separable building block shared by st_interp (trilinear) and
    bilinear_resize."""
    a_lo = xp.take(arr, lo, axis=axis)
    a_hi = xp.take(arr, hi, axis=axis)
    shape = [1] * arr.ndim
    shape[axis] = -1
    w = xp.reshape(alpha, shape)
    return a_lo * (1 - w) + a_hi * w


def st_interp(low, s_enhance, t_enhance, t_centered=False):
    """Tri-linear spatiotemporal interpolation of a ``(s1, s2, t)`` field
    onto the enhanced grid, with cell-centered spatial registration and
    linear extrapolation at the edges.

    Matches the reference's RegularGridInterpolator-with-extrapolation
    baseline (reference: sup3r/models/utilities.py:161-212) but built
    from explicit gather+lerp so it jits onto the TPU VPU.
    """
    assert low.ndim == 3, 'st_interp input must be 3D (s1, s2, t)'
    assert all(s > 1 for s in low.shape), \
        'st_interp input cannot have axes of length 1'
    xp = array_module(low)
    lr_y, lr_x, lr_t = low.shape

    y_lo, y_hi, y_a = _interp1d_weights(
        _axis_points(lr_y), _axis_points(lr_y * s_enhance), xp)
    x_lo, x_hi, x_a = _interp1d_weights(
        _axis_points(lr_x), _axis_points(lr_x * s_enhance), xp)
    t_lo, t_hi, t_a = _interp1d_weights(
        _axis_points(lr_t, offset=t_centered),
        _axis_points(lr_t * t_enhance, offset=t_centered), xp)

    # interpolate one axis at a time (separable trilinear)
    out = _lerp_axis(xp, low, y_lo, y_hi, y_a, 0)
    out = _lerp_axis(xp, out, x_lo, x_hi, x_a, 1)
    return _lerp_axis(xp, out, t_lo, t_hi, t_a, 2)


def get_level_masks(lev_array, level):
    """Boolean masks picking, per (..., level) column, the closest level
    below and the closest level above the requested ``level``. Falls back
    to the two overall-closest levels when one side has no candidates.

    lev_array : ``(..., n_levels)`` array of level values (height or
    pressure), potentially varying per grid point / time.
    """
    xp = array_module(lev_array)
    n_lev = lev_array.shape[-1]
    idx = xp.arange(n_lev)
    idx = xp.broadcast_to(idx, lev_array.shape)

    finite = ~xp.isnan(lev_array)
    above = (lev_array >= level) & finite
    below = (lev_array < level) & finite
    big = xp.asarray(np.inf, dtype=lev_array.dtype)

    # NaN level entries (e.g. below-surface ERA5 heights) are treated
    # as unavailable candidates, like the reference's masked arrays
    # (sup3r/utilities/interpolation.py get_level_masks)
    dist = xp.where(finite, xp.abs(lev_array - level), big)
    dist_below = xp.where(below, dist, big)
    dist_above = xp.where(above, dist, big)

    argmin_below = xp.argmin(dist_below, axis=-1, keepdims=True)
    argmin_above = xp.argmin(dist_above, axis=-1, keepdims=True)
    mask1 = idx == argmin_below
    mask2 = idx == argmin_above

    argmin_any = xp.argmin(dist, axis=-1, keepdims=True)
    below_exists = below.any(axis=-1, keepdims=True)
    mask1 = xp.where(below_exists, mask1, idx == argmin_any)

    above_exists = above.any(axis=-1, keepdims=True)
    dist_alt = xp.where(mask1, big, dist)
    argmin_alt = xp.argmin(dist_alt, axis=-1, keepdims=True)
    mask2 = xp.where(above_exists, mask2, idx == argmin_alt)
    return mask1, mask2


def _lin_vertical(lev0, lev1, var0, var1, level):
    xp = array_module(lev0)
    diff = lev1 - lev0
    alpha = xp.where(xp.abs(diff) < 1e-3, 0.0, (level - lev0) / diff)
    return var0 * (1 - alpha) + var1 * alpha


def _log_vertical(lev0, lev1, var0, var1, level):
    """Fit a*log(h - h0 + 1) + v0 through the two samples, then evaluate.
    Used for near-surface wind profiles."""
    xp = array_module(lev0)
    swap = lev0 >= lev1
    h0 = xp.where(swap, lev1, lev0)
    h1 = xp.where(swap, lev0, lev1)
    v0 = xp.where(swap, var1, var0)
    v1 = xp.where(swap, var0, var1)
    coeff = xp.where(h1 == h0, 0.0, (v1 - v0) / np.log1p(h1 - h0))
    coeff = xp.where(level < h0, -coeff, coeff)
    return coeff * xp.log1p(xp.abs(level - h0)) + v0


def interp_to_level(lev_array, var_array, level, method='linear'):
    """Interpolate ``var_array`` to a fixed ``level`` along the last axis.

    lev_array, var_array : ``(..., n_levels)`` arrays; lev gives the
    height/pressure value of each var entry. Returns ``(...)`` array.
    method : 'linear' | 'log'
    """
    xp = array_module(lev_array, var_array)
    import warnings

    nan_any = bool(np.asarray(np.isnan(np.asarray(lev_array)).any())) \
        if not hasattr(lev_array, 'aval') else False
    if nan_any:
        # reference behavior: interpolate past NaN levels with a
        # warning (interpolation.py docstring: 'Data will be
        # interpolated or extrapolated past these NaN values')
        warnings.warn('lev_array contains NaN values; interpolating '
                      'past them')
    mask1, mask2 = get_level_masks(lev_array, level)
    lev0 = xp.sum(xp.where(mask1, lev_array, 0), axis=-1)
    lev1 = xp.sum(xp.where(mask2, lev_array, 0), axis=-1)
    var0 = xp.sum(xp.where(mask1, var_array, 0), axis=-1)
    var1 = xp.sum(xp.where(mask2, var_array, 0), axis=-1)
    if method == 'log':
        return _log_vertical(lev0, lev1, var0, var1, level)
    return _lin_vertical(lev0, lev1, var0, var1, level)


def bilinear_resize(arr, out_s1, out_s2):
    """Bilinear resize of leading two spatial dims with edge extrapolation
    and cell-centered registration (same convention as st_interp)."""
    xp = array_module(arr)
    s1, s2 = arr.shape[:2]
    y_lo, y_hi, y_a = _interp1d_weights(
        _axis_points(s1), _axis_points(out_s1), xp)
    x_lo, x_hi, x_a = _interp1d_weights(
        _axis_points(s2), _axis_points(out_s2), xp)

    out = _lerp_axis(xp, arr, y_lo, y_hi, y_a, 0)
    return _lerp_axis(xp, out, x_lo, x_hi, x_a, 1)
