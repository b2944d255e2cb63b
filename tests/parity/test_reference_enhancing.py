"""Exec-parity for the reference batch-queue utilities
(sup3r/preprocessing/batch_queues/utilities.py): simple spatial/temporal
enhancing (the low-res conditioning path of the conditional-moment
models) and gaussian smoothing. Pure scipy/numpy module — exec'd as-is.
"""

import numpy as np
import pytest

from sup3r_tpu.ops.coarsen import (
    smooth_data,
    spatial_simple_enhancing,
    temporal_simple_enhancing,
)

REF = '/root/reference/sup3r/preprocessing/batch_queues/utilities.py'


def _load():
    import os
    if not os.path.exists(REF):
        return None
    try:
        ns = {}
        with open(REF) as f:
            exec(compile(f.read(), REF, 'exec'), ns)
        return ns
    except Exception:  # changed imports etc. -> skip, don't error collection
        return None


REF_NS = _load()
pytestmark = pytest.mark.skipif(REF_NS is None,
                                reason='reference source not available')


@pytest.mark.parametrize('shape,obs_axis', [
    ((2, 4, 5, 6, 3), True),
    ((2, 4, 5, 3), True),
    ((4, 5, 6, 3), False),
    ((4, 5, 3), False),
])
@pytest.mark.parametrize('s_enhance', [2, 3, 1, None])
def test_spatial_simple_enhancing_parity(shape, obs_axis, s_enhance):
    """Bit parity: order-0 grid_mode zoom == pixel repeat."""
    rng = np.random.default_rng(0)
    data = rng.normal(size=shape)
    ref = REF_NS['spatial_simple_enhancing'](data.copy(), s_enhance, obs_axis)
    ours = spatial_simple_enhancing(data, s_enhance, obs_axis)
    assert np.array_equal(np.asarray(ours), np.asarray(ref))


def test_spatial_simple_enhancing_error_matches():
    with pytest.raises(ValueError):
        REF_NS['spatial_simple_enhancing'](np.zeros((4, 4)), 2, False)
    with pytest.raises(ValueError):
        spatial_simple_enhancing(np.zeros((4, 4)), 2, False)


@pytest.mark.parametrize('t_enhance', [2, 4, 1, None])
def test_temporal_constant_enhancing_parity(t_enhance):
    rng = np.random.default_rng(1)
    data = rng.normal(size=(2, 3, 3, 5, 2))
    ref = REF_NS['temporal_simple_enhancing'](data.copy(), t_enhance,
                                              'constant')
    ours = temporal_simple_enhancing(data, t_enhance, 'constant')
    assert np.array_equal(np.asarray(ours), np.asarray(ref))


@pytest.mark.parametrize('t_enhance', [2, 3, 4])
def test_temporal_linear_enhancing_parity(t_enhance):
    """Linear mode: the reference anchors LR step i at HR index
    i*t_enhance and EXTRAPOLATES past the last anchor (interp1d
    fill_value='extrapolate', then float32 cast). Our lerp formulation
    is algebraically identical; allow fp reassociation only."""
    rng = np.random.default_rng(2)
    data = rng.normal(size=(2, 3, 3, 6, 2))
    ref = REF_NS['temporal_simple_enhancing'](data.copy(), t_enhance,
                                              'linear')
    ours = temporal_simple_enhancing(data, t_enhance, 'linear')
    assert ref.dtype == np.float32
    assert np.allclose(np.asarray(ours, dtype=np.float64),
                       np.asarray(ref, dtype=np.float64),
                       rtol=0, atol=2e-7)
    # anchors are exact on both sides
    assert np.allclose(np.asarray(ours)[:, :, :, ::t_enhance, :], data,
                       atol=1e-12)


def test_temporal_enhancing_non5d_error_matches():
    with pytest.raises(ValueError):
        REF_NS['temporal_simple_enhancing'](np.zeros((3, 4, 5, 2)), 2,
                                            'constant')
    with pytest.raises(ValueError):
        temporal_simple_enhancing(np.zeros((3, 4, 5, 2)), 2, 'constant')


@pytest.mark.parametrize('ndim', [4, 5])
def test_smooth_data_parity(ndim):
    """Bit parity vs reference smooth_data: same per-slice
    gaussian_filter(mode='nearest') calls, same ignore handling."""
    rng = np.random.default_rng(3)
    shape = (2, 6, 6, 3) if ndim == 4 else (2, 6, 6, 4, 3)
    data = rng.normal(size=shape)
    feats = ['u_100m', 'v_100m', 'topography']
    ignore = ['topography']
    ref = REF_NS['smooth_data'](data.copy(), feats, ignore, smoothing=0.8)
    ours = smooth_data(data.copy(), feats, ignore, smoothing=0.8)
    assert np.array_equal(np.asarray(ours), np.asarray(ref))
    # the ignored channel is untouched
    assert np.array_equal(np.asarray(ours)[..., 2], data[..., 2])


def test_smooth_data_none_is_noop():
    data = np.ones((2, 4, 4, 2))
    ref = REF_NS['smooth_data'](data.copy(), ['a', 'b'], [], smoothing=None)
    ours = smooth_data(data.copy(), ['a', 'b'], [], smoothing=None)
    assert np.array_equal(ours, ref)
    assert np.array_equal(ours, data)
