"""Numerics parity: execute REFERENCE utility sources (read-only, with
their heavy imports stubbed) and verify our implementations are
bit-identical on randomized inputs.

Covers the derived-feature rotation math (transform_rotate_wind /
invert_uv — the correctness heart of u/v wind derivation and of H5
output inversion), the batch coarsening reducers, nearest-neighbor NaN
fill, and physical-limit enforcement. Same exec technique as
tests/pipeline/test_slicer.py.

Reference: sup3r/preprocessing/derivers/utilities.py:146,204;
sup3r/utilities/utilities.py:55,155,345,406.
"""

import os
import sys
import types
import warnings

import numpy as np
import pytest

from sup3r_tpu.ops.coarsen import spatial_coarsening, temporal_coarsening
from sup3r_tpu.ops.wind import invert_uv, transform_rotate_wind
from sup3r_tpu.utilities.utilities import (
    enforce_limits,
    nn_fill_array,
)

REF_DERIVER_UTILS = '/root/reference/sup3r/preprocessing/derivers/utilities.py'
REF_UTILS = '/root/reference/sup3r/utilities/utilities.py'


def _exec_with_stubs(path, stub_modules):
    """Exec a reference source file with stub modules installed."""
    if not os.path.exists(path):
        return None
    saved = {k: sys.modules.get(k) for k in stub_modules}
    sys.modules.update(stub_modules)
    try:
        namespace = {'__file__': path}
        with open(path) as f:
            exec(compile(f.read(), path, 'exec'), namespace)
        return namespace
    except Exception:  # changed imports etc. -> skip, don't error collection
        return None
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _load_ref_deriver_utils():
    """Reference derivers/utilities.py needs dask/rex/sup3r stubs."""
    dask = types.ModuleType('dask')
    dask_array = types.ModuleType('dask.array')
    dask_array.map_blocks = lambda fn, *a, **kw: fn(*a)
    dask.array = dask_array
    rex = types.ModuleType('rex')
    rex_utilities = types.ModuleType('rex.utilities')
    rex_sp = types.ModuleType('rex.utilities.solar_position')
    rex_sp.SolarPosition = type('SolarPosition', (), {})
    sup3r_mod = types.ModuleType('sup3r')
    sup3r_utils_pkg = types.ModuleType('sup3r.utilities')
    sup3r_utils = types.ModuleType('sup3r.utilities.utilities')
    from sup3r_tpu.names import get_feature_basename
    sup3r_utils.get_feature_basename = get_feature_basename
    return _exec_with_stubs(REF_DERIVER_UTILS, {
        'dask': dask,
        'dask.array': dask_array,
        'rex': rex,
        'rex.utilities': rex_utilities,
        'rex.utilities.solar_position': rex_sp,
        'sup3r': sup3r_mod,
        'sup3r.utilities': sup3r_utils_pkg,
        'sup3r.utilities.utilities': sup3r_utils,
    })


def _load_ref_utils():
    """Reference utilities/utilities.py: xarray is the only absent
    import in this image (tensorflow/pandas/scipy/packaging are real);
    __file__ resolves output_attrs.json from the reference tree."""
    xr = types.ModuleType('xarray')
    return _exec_with_stubs(REF_UTILS, {'xarray': xr})


REF_DU = _load_ref_deriver_utils()
REF_U = _load_ref_utils()

pytestmark = pytest.mark.skipif(
    REF_DU is None or REF_U is None,
    reason='reference sources not available',
)


def _grids(rng):
    """Lat/lon rasters covering the orientations the transform branches
    on: descending lat (standard), ascending (invert_lat), curvilinear
    (rotated grid), and a dateline-wrapping longitude raster."""
    s1, s2 = 7, 6
    lat_desc = np.linspace(45, 40, s1)[:, None] + np.zeros((1, s2))
    lon = np.linspace(-106, -105, s2)[None, :] + np.zeros((s1, 1))
    regular = np.dstack([lat_desc, lon])

    ascending = regular[::-1].copy()

    # rotated/curvilinear: columns not aligned with true north
    ii, jj = np.meshgrid(np.arange(s1), np.arange(s2), indexing='ij')
    ang = 0.3
    lat_c = 45 - 0.5 * (np.cos(ang) * ii + np.sin(ang) * jj)
    lon_c = -106 + 0.5 * (np.cos(ang) * jj - np.sin(ang) * ii)
    lat_c += rng.uniform(-0.02, 0.02, lat_c.shape)
    lon_c += rng.uniform(-0.02, 0.02, lon_c.shape)
    curvi = np.dstack([lat_c, lon_c])

    # dateline wrap: lon jumps 179.8 -> -179.9 between columns
    lon_w = (np.linspace(179.5, 180.7, s2)[None, :]
             + np.zeros((s1, 1)) + 360) % 360
    lon_w = np.where(lon_w > 180, lon_w - 360, lon_w)
    wrap = np.dstack([lat_desc, lon_w])

    return {'regular': regular, 'ascending': ascending,
            'curvilinear': curvi, 'wrap': wrap}


@pytest.mark.parametrize('grid', ['regular', 'ascending', 'curvilinear',
                                  'wrap'])
def test_transform_rotate_wind_parity(grid):
    """Bit parity vs reference transform_rotate_wind
    (derivers/utilities.py:146) across grid orientations."""
    rng = np.random.default_rng(0)
    lat_lon = _grids(rng)[grid]
    s1, s2, _ = lat_lon.shape
    ws = rng.uniform(0, 25, (s1, s2, 5))
    wd = rng.uniform(0, 360, (s1, s2, 5))

    ref_u, ref_v = REF_DU['transform_rotate_wind'](
        ws.copy(), wd.copy(), lat_lon.copy())
    u, v = transform_rotate_wind(ws, wd, lat_lon)
    assert np.array_equal(np.asarray(u), np.asarray(ref_u))
    assert np.array_equal(np.asarray(v), np.asarray(ref_v))


@pytest.mark.parametrize('grid', ['regular', 'ascending', 'curvilinear',
                                  'wrap'])
def test_invert_uv_parity_and_roundtrip(grid):
    """Bit parity vs reference invert_uv (derivers/utilities.py:204),
    plus the ws/wd -> u/v -> ws/wd roundtrip both sides agree on."""
    rng = np.random.default_rng(1)
    lat_lon = _grids(rng)[grid]
    s1, s2, _ = lat_lon.shape
    u = rng.uniform(-15, 15, (s1, s2, 4))
    v = rng.uniform(-15, 15, (s1, s2, 4))

    ref_ws, ref_wd = REF_DU['invert_uv'](u.copy(), v.copy(), lat_lon.copy())
    ws, wd = invert_uv(u, v, lat_lon)
    assert np.array_equal(np.asarray(ws), np.asarray(ref_ws))
    assert np.array_equal(np.asarray(wd), np.asarray(ref_wd))

    # roundtrip through our transform matches the reference's roundtrip
    u2, v2 = transform_rotate_wind(ws, wd, lat_lon)
    ref_u2, ref_v2 = REF_DU['transform_rotate_wind'](
        np.asarray(ref_ws), np.asarray(ref_wd), lat_lon.copy())
    assert np.array_equal(np.asarray(u2), np.asarray(ref_u2))
    assert np.allclose(u2, u, atol=1e-9)
    assert np.allclose(v2, v, atol=1e-9)


def test_single_row_grid_rotation():
    """s1 == 1 grids skip the roll-row fix in both implementations."""
    rng = np.random.default_rng(2)
    lat_lon = np.dstack([np.full((1, 5), 42.0),
                         np.linspace(-106, -105, 5)[None, :]])
    ws = rng.uniform(0, 20, (1, 5, 3))
    wd = rng.uniform(0, 360, (1, 5, 3))
    ref_u, ref_v = REF_DU['transform_rotate_wind'](
        ws.copy(), wd.copy(), lat_lon.copy())
    u, v = transform_rotate_wind(ws, wd, lat_lon)
    assert np.array_equal(np.asarray(u), np.asarray(ref_u))
    assert np.array_equal(np.asarray(v), np.asarray(ref_v))


SPATIAL_CASES = [
    ((4, 8, 8, 6, 3), 2, True),
    ((4, 6, 6, 3), 3, True),
    ((2, 10, 4), 2, True),
    ((8, 8, 6, 3), 2, False),
    ((6, 9, 5), 3, False),
    ((4, 4), 2, False),
    ((4, 8, 8, 6, 3), 1, True),      # no-op factor
    ((4, 8, 8, 6, 3), None, True),   # no-op factor
]


@pytest.mark.parametrize('shape,s_enhance,obs_axis', SPATIAL_CASES)
def test_spatial_coarsening_parity(shape, s_enhance, obs_axis):
    """Bit parity vs reference spatial_coarsening (utilities.py:406)."""
    rng = np.random.default_rng(3)
    data = rng.normal(size=shape)
    ref = REF_U['spatial_coarsening'](data.copy(), s_enhance, obs_axis)
    ours = spatial_coarsening(data, s_enhance, obs_axis)
    assert np.array_equal(np.asarray(ours), np.asarray(ref))


@pytest.mark.parametrize('shape,s_enhance,obs_axis', [
    ((8, 8), 2, True),      # too few dims for obs_axis
    ((9, 8, 6, 3), 2, False),  # indivisible
    ((4, 9, 8, 6, 3), 2, True),
])
def test_spatial_coarsening_errors_match(shape, s_enhance, obs_axis):
    data = np.zeros(shape)
    with pytest.raises(ValueError):
        REF_U['spatial_coarsening'](data, s_enhance, obs_axis)
    with pytest.raises(ValueError):
        spatial_coarsening(data, s_enhance, obs_axis)


@pytest.mark.parametrize('method', ['subsample', 'average', 'total', 'min',
                                    'max'])
def test_temporal_coarsening_parity(method):
    """Bit parity vs reference temporal_coarsening (utilities.py:345),
    including NaN handling (average/total are nansum-based)."""
    rng = np.random.default_rng(4)
    data = rng.normal(size=(3, 4, 4, 12, 2))
    if method in ('average', 'total'):
        data[0, 1, 2, 3, 0] = np.nan
        data[2, 0, 0, :, 1] = np.nan
    ref = REF_U['temporal_coarsening'](data.copy(), 4, method)
    ours = temporal_coarsening(data, 4, method)
    assert np.array_equal(np.asarray(ours), np.asarray(ref),
                          equal_nan=True)


def test_temporal_coarsening_bad_method_matches():
    data = np.zeros((1, 2, 2, 4, 1))
    with pytest.raises(KeyError):
        REF_U['temporal_coarsening'](data, 2, 'median')
    with pytest.raises(KeyError):
        temporal_coarsening(data, 2, 'median')


def test_temporal_coarsening_non5d_passthrough():
    data = np.arange(24.0).reshape(2, 3, 4)
    ref = REF_U['temporal_coarsening'](data.copy(), 2, 'average')
    ours = temporal_coarsening(data, 2, 'average')
    assert np.array_equal(ours, ref)
    assert np.array_equal(ours, data)


@pytest.mark.parametrize('ndim', [1, 2, 3])
def test_nn_fill_array_parity(ndim):
    """Bit parity vs reference nn_fill_array (utilities.py:55)."""
    rng = np.random.default_rng(5)
    shape = (17,) if ndim == 1 else (9, 11) if ndim == 2 else (5, 6, 7)
    data = rng.normal(size=shape)
    mask = rng.uniform(size=shape) < 0.3
    data[mask] = np.nan
    ref = REF_U['nn_fill_array'](data.copy())
    ours = nn_fill_array(data.copy())
    assert np.array_equal(np.asarray(ours), np.asarray(ref))
    assert not np.isnan(ours).any()


@pytest.mark.parametrize('nn_fill', [False, True])
def test_enforce_limits_parity(nn_fill):
    """Bit parity vs reference enforce_limits (utilities.py:155) on
    data straddling the physical limits, both clip and nn-fill modes."""
    rng = np.random.default_rng(6)
    features = ['windspeed_100m', 'winddirection_100m', 'temperature_2m']
    data = np.stack([
        rng.uniform(-5, 130, (6, 6, 4)),    # ws limits (0, 120)
        rng.uniform(-10, 370, (6, 6, 4)),   # wd limits (0, 360)
        rng.uniform(-150, 150, (6, 6, 4)),  # temp limits (-200, 100)
    ], axis=-1)
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        ref = REF_U['enforce_limits'](features, data.copy(), nn_fill=nn_fill)
        ours = enforce_limits(features, data.copy(), nn_fill=nn_fill)
    assert ours.dtype == ref.dtype == np.float32
    assert np.array_equal(np.asarray(ours), np.asarray(ref))


def test_enforce_limits_unknown_feature_matches():
    data = np.zeros((2, 2, 1))
    with pytest.raises(KeyError):
        REF_U['enforce_limits'](['not_a_feature'], data.copy())
    with pytest.raises(KeyError):
        enforce_limits(['not_a_feature'], data.copy())
