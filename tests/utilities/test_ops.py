"""Core ops: coarsening, enhancing, wind transforms, interpolation.

Mirrors the reference's tests/utilities/test_utilities.py coverage.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sup3r_tpu.names import parse_feature
from sup3r_tpu.ops import (
    invert_uv,
    smooth_data,
    spatial_coarsening,
    spatial_simple_enhancing,
    st_interp,
    temporal_coarsening,
    temporal_simple_enhancing,
    transform_rotate_wind,
)
from sup3r_tpu.ops.interp import bilinear_resize, interp_to_level
from sup3r_tpu.utilities import enforce_limits, nn_fill_array

RNG = np.random.default_rng(0)


def test_parse_feature():
    assert parse_feature('u_100m') == ('u', 100, None)
    assert parse_feature('U_100m') == ('u', 100, None)
    assert parse_feature('temperature_850pa') == ('temperature', None, 850)
    assert parse_feature('topography') == ('topography', None, None)
    assert parse_feature('clearsky_ratio') == ('clearsky_ratio', None, None)


def test_spatial_coarsening_obs_axis():
    data = RNG.random((4, 8, 8, 6, 3)).astype(np.float32)
    out = spatial_coarsening(data, 2, obs_axis=True)
    assert out.shape == (4, 4, 4, 6, 3)
    expected = data.reshape(4, 4, 2, 4, 2, 6, 3).mean(axis=(2, 4))
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_spatial_coarsening_no_obs_axis():
    data = RNG.random((8, 8, 6, 3)).astype(np.float32)
    out = spatial_coarsening(data, 4, obs_axis=False)
    assert out.shape == (2, 2, 6, 3)
    expected = data.reshape(2, 4, 2, 4, 6, 3).mean(axis=(1, 3))
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_spatial_coarsening_errors():
    with pytest.raises(ValueError):
        spatial_coarsening(RNG.random((7, 7, 3)), 2, obs_axis=False)
    with pytest.raises(ValueError):
        spatial_coarsening(RNG.random((8,)), 2, obs_axis=False)


@pytest.mark.parametrize('method', ['subsample', 'average', 'min', 'max',
                                    'total'])
def test_temporal_coarsening(method):
    data = RNG.random((2, 4, 4, 12, 2)).astype(np.float32)
    out = temporal_coarsening(data, t_enhance=4, method=method)
    assert out.shape == (2, 4, 4, 3, 2)
    grouped = data.reshape(2, 4, 4, 3, 4, 2)
    if method == 'subsample':
        np.testing.assert_allclose(out, data[:, :, :, ::4, :])
    elif method == 'average':
        np.testing.assert_allclose(out, grouped.mean(axis=4), rtol=1e-6)
    elif method == 'total':
        np.testing.assert_allclose(out, grouped.sum(axis=4), rtol=1e-6)
    elif method == 'min':
        np.testing.assert_allclose(out, grouped.min(axis=4))
    elif method == 'max':
        np.testing.assert_allclose(out, grouped.max(axis=4))


def test_coarsen_then_enhance_roundtrip():
    data = RNG.random((2, 4, 4, 6, 2)).astype(np.float32)
    up = spatial_simple_enhancing(data, 2)
    assert up.shape == (2, 8, 8, 6, 2)
    down = spatial_coarsening(up, 2)
    np.testing.assert_allclose(down, data, rtol=1e-6)

    up_t = temporal_simple_enhancing(data, 2, mode='constant')
    assert up_t.shape == (2, 4, 4, 12, 2)
    down_t = temporal_coarsening(up_t, 2, method='average')
    np.testing.assert_allclose(down_t, data, rtol=1e-6)


def test_temporal_linear_enhancing_matches_reference():
    """Reference registration: LR step i anchors HR index i*t_enh
    with linear extrapolation past the last anchor (scipy interp1d
    fill_value='extrapolate'; batch_queues/utilities.py:40-45)."""
    from scipy.interpolate import interp1d

    data = RNG.random((2, 3, 3, 6, 2)).astype(np.float32)
    for te in (2, 3):
        out = temporal_simple_enhancing(data, te, mode='linear')
        idx_hr = np.arange(data.shape[3] * te)
        ref = interp1d(idx_hr[::te], data, axis=3,
                       fill_value='extrapolate')(idx_hr)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
    # anchors hit the LR values exactly
    out = temporal_simple_enhancing(data, 2, mode='linear')
    np.testing.assert_allclose(out[:, :, :, ::2], data, rtol=1e-6)


def test_jax_numpy_dispatch_agrees():
    data = RNG.random((2, 4, 4, 4, 2)).astype(np.float32)
    np_out = spatial_coarsening(data, 2)
    jax_out = spatial_coarsening(jnp.asarray(data), 2)
    assert isinstance(np_out, np.ndarray)
    np.testing.assert_allclose(np.asarray(jax_out), np_out, rtol=1e-6)


def test_wind_transform_roundtrip():
    s1, s2, t = 6, 5, 4
    lat = np.linspace(40, 39, s1)[:, None] * np.ones((1, s2))
    lon = np.linspace(-105, -104, s2)[None] * np.ones((s1, 1))
    lat_lon = np.dstack([lat, lon])
    ws = 5 + 3 * RNG.random((s1, s2, t))
    wd = 360 * RNG.random((s1, s2, t))
    u, v = transform_rotate_wind(ws, wd, lat_lon)
    ws2, wd2 = invert_uv(u, v, lat_lon)
    np.testing.assert_allclose(ws, ws2, atol=1e-6)
    np.testing.assert_allclose(
        np.sin(np.radians(wd)), np.sin(np.radians(wd2)), atol=1e-6)
    np.testing.assert_allclose(
        np.cos(np.radians(wd)), np.cos(np.radians(wd2)), atol=1e-6)


def test_wind_transform_ascending_lats():
    """Ascending-lat grids are flipped internally and restored."""
    s1, s2, t = 4, 4, 3
    lat = np.linspace(39, 40, s1)[:, None] * np.ones((1, s2))
    lon = np.linspace(-105, -104, s2)[None] * np.ones((s1, 1))
    lat_lon = np.dstack([lat, lon])
    ws = 5 * np.ones((s1, s2, t))
    wd = 90 * np.ones((s1, s2, t))
    u, v = transform_rotate_wind(ws, wd, lat_lon)
    ws2, wd2 = invert_uv(u, v, lat_lon)
    np.testing.assert_allclose(ws, ws2, atol=1e-6)
    np.testing.assert_allclose(wd, wd2, atol=1e-4)


def test_st_interp_is_exact_for_linear_fields():
    """Trilinear interp with extrapolation reproduces affine fields."""
    s1, s2, t = 4, 5, 6
    y, x, tt = np.meshgrid(np.arange(s1), np.arange(s2), np.arange(t),
                           indexing='ij')
    low = (2.0 * y + 3.0 * x + 0.5 * tt).astype(np.float64)
    out = st_interp(low, 2, 2)
    assert out.shape == (8, 10, 12)
    yy, xx, ttt = np.meshgrid(
        np.arange(8), np.arange(10), np.arange(12), indexing='ij')
    # affine field on enhanced grid: account for cell-centered registration
    expected = (2.0 * ((yy + 0.5) / 2 - 0.5) + 3.0 * ((xx + 0.5) / 2 - 0.5)
                + 0.5 * (ttt / 2))
    np.testing.assert_allclose(out, expected, atol=1e-10)


def test_interp_to_level_linear():
    lev = np.array([[[[10.0, 40.0, 100.0]]]])
    var = np.array([[[[1.0, 4.0, 10.0]]]])
    out = interp_to_level(lev, var, 25.0)
    np.testing.assert_allclose(out, [[[2.5]]], rtol=1e-6)
    # above all levels: linear extrapolation from two closest
    out_hi = interp_to_level(lev, var, 120.0)
    assert out_hi.shape == (1, 1, 1)


def test_interp_to_level_log():
    lev = np.full((2, 2, 3, 2), [10.0, 100.0])
    var = np.log1p(lev - 10.0) * 2.0 + 1.0
    out = interp_to_level(lev, var, 40.0, method='log')
    np.testing.assert_allclose(
        out, np.log1p(30.0) * 2.0 + 1.0, rtol=1e-5)


def test_nn_fill_array():
    arr = np.array([[1.0, np.nan], [np.nan, 4.0]])
    out = nn_fill_array(arr)
    assert not np.isnan(out).any()
    assert out[0, 0] == 1.0 and out[1, 1] == 4.0


def test_enforce_limits_clips():
    data = np.array([[[200.0, -500.0]]], dtype=np.float32)
    out = enforce_limits(['windspeed', 'u_100m'], data.copy())
    assert out[0, 0, 0] == 120.0
    assert out[0, 0, 1] == -120.0


def test_smooth_data_ignores_features():
    data = RNG.random((2, 8, 8, 2)).astype(np.float32)
    out = smooth_data(data.copy(), ['u_10m', 'topography'],
                      ['topography'], smoothing=1.0)
    assert not np.allclose(out[..., 0], data[..., 0])
    np.testing.assert_allclose(out[..., 1], data[..., 1])


def test_smooth_data_no_mutation_and_jax_input():
    """smooth_data must copy: a numpy caller's batch must not be
    mutated in place, and a jax input (np.asarray gives a READ-ONLY
    view) must not crash the in-place filter writes."""
    import jax.numpy as jnp

    data = RNG.random((2, 8, 8, 2)).astype(np.float32)
    orig = data.copy()
    out = smooth_data(data, ['u_10m', 'v_10m'], [], smoothing=1.0)
    np.testing.assert_array_equal(data, orig)
    assert not np.allclose(out, orig)
    out_j = smooth_data(jnp.asarray(data), ['u_10m', 'v_10m'], [],
                        smoothing=1.0)
    np.testing.assert_allclose(out_j, out, rtol=1e-6)


def test_bilinear_resize_shape():
    arr = RNG.random((4, 4, 3))
    out = bilinear_resize(arr, 8, 8)
    assert out.shape == (8, 8, 3)


def test_solar_zenith_physical_sanity():
    """Solar zenith physics: minimum near local solar noon, >90 at
    night, seasonal symmetry about the equator at the equinox."""
    import pandas as pd

    from sup3r_tpu.ops.solar_pos import solar_zenith

    # Denver-ish in June: UTC noon-ish minimum around 19:00 UTC
    ti = pd.date_range('2023-06-21', periods=24, freq='h')
    ll = np.array([[[39.7, -105.0]]])
    sza = solar_zenith(ti, ll)[0, 0]
    assert sza.shape == (24,)
    assert 17 <= int(np.argmin(sza)) <= 21  # local solar noon ~19 UTC
    assert sza.min() < 20  # near-summer-solstice midday sun is high
    assert sza.max() > 90  # night exists
    # equinox symmetry: +40 and -40 latitude see the same noon zenith
    ti_eq = pd.date_range('2023-03-20 12:00', periods=1, freq='h')
    n = solar_zenith(ti_eq, np.array([[[40.0, 0.0]]]))[0, 0, 0]
    s = solar_zenith(ti_eq, np.array([[[-40.0, 0.0]]]))[0, 0, 0]
    np.testing.assert_allclose(n, s, atol=1.0)
    # and the equator sees the sun nearly overhead
    e = solar_zenith(ti_eq, np.array([[[0.0, 0.0]]]))[0, 0, 0]
    assert e < 5


def test_wind_transform_meridian_consistency():
    """(ws, wd) -> (u, v) -> (ws, wd) roundtrips on grids crossing the
    180-degree meridian."""
    from sup3r_tpu.ops import invert_uv, transform_rotate_wind

    lat = np.linspace(60, 59, 4)
    lon = ((178.0 + np.arange(4) * 1.2 + 180) % 360) - 180
    ll = np.dstack(np.meshgrid(lat, lon, indexing='ij'))
    rng = np.random.default_rng(0)
    ws = (5 + 10 * rng.random((4, 4, 3))).astype(np.float32)
    wd = (360 * rng.random((4, 4, 3))).astype(np.float32)
    u, v = transform_rotate_wind(ws, wd, ll)
    ws2, wd2 = invert_uv(u, v, ll)
    np.testing.assert_allclose(ws2, ws, atol=0.05)
    dd = np.abs(((wd2 - wd) + 180) % 360 - 180)
    assert dd.max() < 1.0
