"""Spatial / temporal coarsening and simple enhancing.

These are the work-horses of GAN training: the batch queue produces the
low-res input by coarsening sampled high-res data. All functions are
reshape-reduce programs that XLA fuses into a handful of vector ops —
run them on device inside the train step rather than on the host
producer thread.

Reference parity: sup3r/utilities/utilities.py:345 (temporal_coarsening),
:406 (spatial_coarsening), sup3r/preprocessing/batch_queues/utilities.py:12
(temporal_simple_enhancing), :106 (spatial_simple_enhancing), :62
(smooth_data).
"""

import numpy as np
from scipy.ndimage import gaussian_filter

from sup3r_tpu.ops._dispatch import array_module


def spatial_coarsening(data, s_enhance=2, obs_axis=True):
    """Block-mean coarsen the two spatial dims by ``s_enhance``.

    Parameters
    ----------
    data : array
        With ``obs_axis=True``: ``(n_obs, s1, s2, ...)``;
        with ``obs_axis=False``: ``(s1, s2, ...)``. 2D–5D supported.
    s_enhance : int
        Coarsening factor; must evenly divide both spatial dims.
    obs_axis : bool
        Whether axis 0 is an observation/batch axis.
    """
    xp = array_module(data)
    if s_enhance is None or s_enhance <= 1:
        return data

    ax = 1 if obs_axis else 0
    ndim = data.ndim
    min_dims = 3 if obs_axis else 2
    if ndim < min_dims:
        raise ValueError(
            f'Need >= {min_dims} dims for spatial coarsening with '
            f'obs_axis={obs_axis}, got shape {data.shape}'
        )
    s1, s2 = data.shape[ax], data.shape[ax + 1]
    if s1 % s_enhance or s2 % s_enhance:
        raise ValueError(
            f's_enhance={s_enhance} must evenly divide spatial shape '
            f'({s1}, {s2})'
        )

    lead = data.shape[:ax]
    trail = data.shape[ax + 2:]
    new_shape = (
        *lead, s1 // s_enhance, s_enhance, s2 // s_enhance, s_enhance, *trail
    )
    reshaped = xp.reshape(data, new_shape)
    return reshaped.sum(axis=(ax + 1, ax + 3)) / (s_enhance * s_enhance)


def temporal_coarsening(data, t_enhance=4, method='subsample'):
    """Coarsen the temporal axis of a 5D ``(n_obs, s1, s2, t, f)`` batch.

    method : 'subsample' | 'average' | 'total' | 'min' | 'max'
    """
    xp = array_module(data)
    if t_enhance is None or data.ndim != 5:
        return data
    if method == 'subsample':
        return data[:, :, :, ::t_enhance, :]

    n, s1, s2, t, f = data.shape
    grouped = xp.reshape(data, (n, s1, s2, t // t_enhance, t_enhance, f))
    if method == 'average':
        return xp.nansum(grouped, axis=4) / t_enhance
    if method == 'total':
        return xp.nansum(grouped, axis=4)
    if method == 'min':
        return grouped.min(axis=4)
    if method == 'max':
        return grouped.max(axis=4)
    raise KeyError(
        f'Unknown temporal_coarsening method "{method}"; options: '
        '[subsample, average, total, min, max]'
    )


def spatial_simple_enhancing(data, s_enhance=2, obs_axis=True):
    """Nearest-neighbor upsample of the spatial dims (repeat each pixel
    ``s_enhance`` times along both spatial axes).

    Rank validation matches the reference
    (preprocessing/batch_queues/utilities.py:131-141,169-175): <3D always
    rejected; with ``obs_axis=True`` only 4D/5D enhance, with
    ``obs_axis=False`` only 3D/4D.
    """
    xp = array_module(data)
    if data.ndim < 3:
        raise ValueError(
            'Data must be 3D, 4D, or 5D to do spatial enhancing, but '
            f'received: {data.shape}'
        )
    if s_enhance is None or s_enhance <= 1:
        return data
    ok = data.ndim in ((4, 5) if obs_axis else (3, 4))
    if not ok:
        raise ValueError(
            'Data must be 3D, 4D, or 5D to do spatial enhancing, but '
            f'received: {data.shape} (obs_axis={obs_axis})'
        )
    ax = 1 if obs_axis else 0
    out = xp.repeat(data, s_enhance, axis=ax)
    return xp.repeat(out, s_enhance, axis=ax + 1)


def temporal_simple_enhancing(data, t_enhance=4, mode='constant'):
    """Upsample the temporal axis of a 5D batch.

    mode='constant' repeats each step ``t_enhance`` times; mode='linear'
    linearly interpolates onto the enhanced time grid.

    Non-5D input with an active ``t_enhance`` raises ValueError, matching
    the reference (preprocessing/batch_queues/utilities.py:46-52).
    """
    xp = array_module(data)
    if t_enhance is None or t_enhance == 1:
        return data
    if data.ndim != 5:
        raise ValueError(
            'Data must be 5D to do temporal enhancing, but '
            f'received: {data.shape}'
        )
    if mode == 'constant':
        return xp.repeat(data, t_enhance, axis=3)
    if mode == 'linear':
        t = data.shape[3]
        new_t = t * t_enhance
        # reference registration (batch_queues/utilities.py:40-45):
        # LR step i anchors at HR index i*t_enhance, with LINEAR
        # EXTRAPOLATION past the last anchor — a compressed
        # pinned-endpoint linspace changes every interpolated value
        pos = xp.arange(new_t) / float(t_enhance)
        lo = xp.clip(xp.floor(pos).astype(int), 0, t - 1)
        hi = xp.clip(lo + 1, 0, t - 1)
        w = (pos - lo)[None, None, None, :, None]
        lo_v = data[:, :, :, lo, :]
        hi_v = data[:, :, :, hi, :]
        out = lo_v * (1 - w) + hi_v * w
        if t > 1:
            # extrapolate the tail (pos > t-1): hi==lo==t-1 there, so
            # continue the last segment's slope instead of clamping
            tail = pos > (t - 1)
            if bool(xp.any(tail)):
                slope = (data[:, :, :, t - 1:t, :]
                         - data[:, :, :, t - 2:t - 1, :])
                excess = (pos - (t - 1))[None, None, None, :, None]
                extrap = data[:, :, :, t - 1:t, :] + slope * excess
                mask = tail[None, None, None, :, None]
                out = xp.where(mask, extrap, out)
        return out
    raise KeyError(f'Unknown temporal enhancing mode "{mode}"')


def smooth_data(low_res, training_features, smoothing_ignore,
                smoothing=None):
    """Gaussian-smooth each spatial slice of a low-res batch (host path).

    Parameters
    ----------
    low_res : np.ndarray
        4D ``(n, s1, s2, f)`` or 5D ``(n, s1, s2, t, f)`` batch.
    training_features : list
        Feature names ordered like the last axis.
    smoothing_ignore : list
        Features to leave unsmoothed (e.g. topography).
    smoothing : float | None
        Gaussian sigma; None is a no-op.

    Reference parity: sup3r/preprocessing/batch_queues/base.py smoothing
    branch (gaussian_filter mode='nearest').
    """
    if smoothing is None:
        return low_res
    # copy: np.asarray over a jax array yields a READ-ONLY view (the
    # in-place writes below would raise) and over a numpy input it
    # would silently mutate the caller's batch
    low_res = np.array(low_res)
    feat_iter = [
        j for j, f in enumerate(training_features)
        if f not in smoothing_ignore
    ]
    for i in range(low_res.shape[0]):
        for j in feat_iter:
            if low_res.ndim == 5:
                for t in range(low_res.shape[3]):
                    low_res[i, ..., t, j] = gaussian_filter(
                        low_res[i, ..., t, j], smoothing, mode='nearest')
            else:
                low_res[i, ..., j] = gaussian_filter(
                    low_res[i, ..., j], smoothing, mode='nearest')
    return low_res

