"""Device-side output packing: u/v inversion + physical limits +
integer quantization as ONE jitted program on the cropped chunk batch,
so the device->host fetch carries cropped int16/uint16 bytes instead
of the full padded float32 block.

Why this exists: in the chunked inference drain, the device->host
transfer is the dominant cost (PCIe on a real host; the tunnel here —
see docs/PERFORMANCE.md three-tier attribution), and the reference
pipeline's output transform (u/v -> ws/wd rotation, limit clipping,
``round(x * scale_factor).astype(int16)``; reference
sup3r/postprocessing/writers/base.py:232-346 +
sup3r/utilities/utilities.py:155) runs per pixel on the host CPU.
Both costs shrink together by packing ON DEVICE: the fetch moves
2 bytes/voxel of already-final storage values (>=2x fewer bytes, plus
the halo crop), and the host writer only hands buffers to h5py.

Parity notes:
- The rotation reuses :func:`sup3r_tpu.ops.wind.invert_uv_core` — the
  SAME formula as the host path — with the grid angle computed on host
  by the SAME ``_grid_angle`` numpy code, so only the trig/rounding
  ulps differ. Post-quantization that shows up as occasional +-1
  STORAGE QUANTUM flips at round() boundaries (tested bound).
- Quantization mirrors ``np.round(x * scale).astype(dtype)`` including
  the two's-complement wraparound an out-of-range C cast produces
  (explicit modular arithmetic, exact because values are wrapped
  in-range BEFORE the dtype conversion).
- Unknown features raise the same KeyError as ``enforce_limits``.
"""

import functools

import jax
import numpy as np

from sup3r_tpu.names import uv_height_pairs
from sup3r_tpu.ops.wind import _grid_angle, invert_uv_core
from sup3r_tpu.utilities.utilities import (
    OUTPUT_ATTRS,
    get_feature_basename,
)

__all__ = ['pack_plan', 'pack_chunks', 'theta_for']


def pack_plan(features, invert_uv):
    """Resolve the static (hashable) pack plan on host.

    Returns ``(names, pairs, quant)``: the final storage feature names
    after u/v inversion, the (u_idx, v_idx) channel pairs to rotate,
    and per-feature quantization specs ``(dtype, scale, lo, hi)``.
    Raises KeyError for features without OUTPUT_ATTRS — the same error
    the host path's ``enforce_limits`` raises."""
    feats = [str(f) for f in features]
    names = list(feats)
    pairs = []
    if invert_uv:
        for h, ui, vi in uv_height_pairs(feats):
            pairs.append((ui, vi))
            names[ui] = f'windspeed_{h}m'
            names[vi] = f'winddirection_{h}m'
    quant = []
    for name in names:
        base = get_feature_basename(name)
        if base not in OUTPUT_ATTRS:
            raise KeyError(
                f'No known physical limits for feature "{base}"')
        a = OUTPUT_ATTRS[base]
        quant.append((str(a.get('dtype', 'float32')),
                      float(a.get('scale_factor', 1.0)),
                      float(a.get('min', -np.inf)),
                      float(a.get('max', np.inf))))
    return tuple(names), tuple(pairs), tuple(quant)


def theta_for(lat_lon, invert_lat):
    """Grid angle for one chunk's HR lat_lon, host-computed by the
    same ``_grid_angle`` code the host inversion uses (identical
    values), on orientation-flipped coords when ``invert_lat``."""
    ll = np.asarray(lat_lon, dtype=np.float32)
    if invert_lat:
        ll = ll[::-1]
    return np.asarray(_grid_angle(ll, np), dtype=np.float32)


def _quantize(x, dtype_name, scale, jnp):
    """Mirror ``np.round(x * scale).astype(dtype)`` for integer
    storage dtypes, with the out-of-range wraparound made explicit
    (modular shift into the dtype's range, then an exact in-range
    conversion)."""
    if dtype_name == 'float32':
        return x
    info = np.iinfo(np.dtype(dtype_name))
    span = float(info.max) - float(info.min) + 1.0
    v = jnp.round(x * scale)
    v = jnp.mod(v - float(info.min), span) + float(info.min)
    return v.astype(np.dtype(dtype_name))


@functools.partial(
    jax.jit, static_argnames=('pairs', 'quant', 'invert_lat'))
def _pack_jit(out, theta, pairs, quant, invert_lat):
    """out: (n, s1, s2, t, f) cropped model output (model units);
    theta: (n, s1, s2). Returns (packed, stats): per-feature
    (n, t, s1*s2) storage arrays in writer layout, plus the
    output-check statistics computed on the PRE-transform data."""
    import jax.numpy as jnp

    n, s1, s2, t, f = out.shape
    flat = out.reshape(n, -1, f)
    stats = {
        'nan_any': jnp.isnan(flat).any(axis=(1, 2)),
        'ch_const': jnp.all(flat == flat[:, :1, :], axis=1),
        'ch_first': flat[:, 0, :],
    }
    chans = [out[..., i] for i in range(f)]
    th = theta[..., None]
    for ui, vi in pairs:
        ws, wd = invert_uv_core(chans[ui], chans[vi], th, invert_lat,
                                jnp, s_axis=1)
        chans[ui], chans[vi] = ws, wd
    packed, mins, maxs = [], [], []
    for i, (dt, scale, lo, hi) in enumerate(quant):
        x = chans[i]
        mins.append(x.min(axis=(1, 2, 3)))
        maxs.append(x.max(axis=(1, 2, 3)))
        x = jnp.clip(x, lo, hi)
        # writer layout (sites flattened row-major, time leading):
        # data[..., i].reshape(s1*s2, t).T done on device
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, t, s1 * s2)
        packed.append(_quantize(x, dt, scale, jnp))
    stats['ch_min'] = jnp.stack(mins, axis=-1)
    stats['ch_max'] = jnp.stack(maxs, axis=-1)
    return tuple(packed), stats


def pack_chunks(out, theta, pairs, quant, invert_lat):
    """Jitted batch pack (see ``_pack_jit``); entry point kept
    separate so callers never import jax.numpy themselves."""
    return _pack_jit(out, theta, pairs, quant, invert_lat)
