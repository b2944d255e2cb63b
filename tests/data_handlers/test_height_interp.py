"""Vertical level interpolation sweeps (mirrors reference
tests/derivers/test_height_interp.py): pressure-level height interp
via zg/topography, mixed multi+single-level data, log-profile
interpolation, extrapolation fallbacks, and interp + derivation
chains."""

import numpy as np
import pytest

from sup3r_tpu.ops.interp import get_level_masks, interp_to_level
from sup3r_tpu.preprocessing.data_handlers import DataHandler
from sup3r_tpu.preprocessing.derivers import Deriver
from sup3r_tpu.preprocessing.rasterizers import Rasterizer
from sup3r_tpu.utilities.test_helpers import make_fake_nc_file


def _setup_zg(tmp_path, shape=(5, 5, 3), levels=(1000, 900, 800),
              heights=(10, 100, 300), features=('ua',)):
    """NC file with pressure-level features + zg pinned to known
    heights above topography. Returns the raw dataset."""
    fp = make_fake_nc_file(str(tmp_path / 'gcm.nc'), shape,
                           [*features, 'zg'], levels=list(levels))
    fp_orog = make_fake_nc_file(str(tmp_path / 'orog.nc'), shape,
                                ['orog'])
    raw = Rasterizer([fp, fp_orog]).data
    topo = raw['topography']
    zg = np.zeros((*shape, len(heights)), dtype=np.float32)
    for i, h in enumerate(heights):
        zg[..., i] = topo + h
    raw.data_vars['zg'] = zg
    return raw


@pytest.mark.parametrize(('shape', 'height'), [
    ((5, 5, 3), 40),
    ((8, 4, 2), 40),
    ((5, 5, 3), 150),
    ((5, 5, 3), 250),
])
def test_plevel_height_interp_sweep(tmp_path, shape, height):
    """u at an arbitrary height from pressure-level ua + zg heights;
    expected value computed from the known bracketing levels
    (reference: tests/derivers/test_height_interp.py:28-66)."""
    heights = (10, 100, 300)
    raw = _setup_zg(tmp_path, shape=shape, heights=heights)
    deriver = Deriver(raw, [f'ua_{height}m'])
    ua = raw['ua']
    lo, hi = ((0, 1) if height <= 100 else (1, 2))
    h0, h1 = heights[lo], heights[hi]
    alpha = (height - h0) / (h1 - h0)
    expected = ua[..., lo] * (1 - alpha) + ua[..., hi] * alpha
    np.testing.assert_allclose(deriver.data[f'ua_{height}m'], expected,
                               atol=1e-4)


def test_height_below_lowest_clamps(tmp_path):
    """A height below every zg level clamps to the closest level —
    the reference's mask fallback picks the overall-closest level for
    BOTH samples when no level sits below (reference:
    utilities/interpolation.py:60-68), so no extrapolation happens."""
    heights = (50, 150)
    raw = _setup_zg(tmp_path, heights=heights, levels=(1000, 900))
    deriver = Deriver(raw, ['ua_10m'])
    np.testing.assert_allclose(deriver.data['ua_10m'],
                               raw['ua'][..., 0], atol=1e-4)


def test_height_interp_plus_derivation(tmp_path):
    """windspeed_40m derives hypot(u_40m, v_40m) where both come from
    level interpolation (reference:
    tests/derivers/test_height_interp.py:68-95)."""
    heights = (10, 100)
    raw = _setup_zg(tmp_path, heights=heights, levels=(1000, 900),
                    features=('u', 'v'))
    deriver = Deriver(raw, ['windspeed_40m'])
    alpha = (40 - 10) / (100 - 10)
    u40 = raw['u'][..., 0] * (1 - alpha) + raw['u'][..., 1] * alpha
    v40 = raw['v'][..., 0] * (1 - alpha) + raw['v'][..., 1] * alpha
    np.testing.assert_allclose(deriver.data['windspeed_40m'],
                               np.hypot(u40, v40), atol=1e-4)


def test_mixed_single_and_multi_level(tmp_path):
    """Interpolation pools pressure-level u (via zg) AND single-level
    u_10m into one level column (reference:
    tests/derivers/test_height_interp.py:211-250)."""
    shape = (5, 5, 3)
    fp = make_fake_nc_file(str(tmp_path / 'gcm.nc'), shape,
                           ['u', 'zg'], levels=[1000, 900])
    fp_sl = make_fake_nc_file(str(tmp_path / 'sl.nc'), shape,
                              ['u10', 'orog'])
    raw = Rasterizer([fp, fp_sl]).data
    topo = raw['topography']
    zg = np.zeros((*shape, 2), dtype=np.float32)
    zg[..., 0] = topo + 100
    zg[..., 1] = topo + 300
    raw.data_vars['zg'] = zg
    deriver = Deriver(raw, ['u_40m'])
    # closest below 40 is u_10m (10m), closest above is u@100m
    alpha = (40 - 10) / (100 - 10)
    expected = (raw['u_10m'] * (1 - alpha)
                + raw['u'][..., 0] * alpha)
    np.testing.assert_allclose(deriver.data['u_40m'], expected,
                               atol=1e-4)


def test_log_interp_method(tmp_path):
    """interp_kwargs={'method': 'log'} wires through the deriver and
    matches the ops-level log interpolation (reference:
    tests/derivers/test_height_interp.py:252-297)."""
    heights = (10, 100)
    raw = _setup_zg(tmp_path, heights=heights, levels=(1000, 900))
    lin = Deriver(raw, ['ua_40m']).data['ua_40m']
    raw2 = _setup_zg(tmp_path, heights=heights, levels=(1000, 900))
    raw2.data_vars['ua'] = raw['ua'].copy()
    raw2.data_vars['zg'] = raw['zg'].copy()
    raw2.data_vars['topography'] = raw['topography'].copy()
    log = Deriver(raw2, ['ua_40m'],
                  interp_kwargs={'method': 'log'}).data['ua_40m']
    topo = raw['topography']
    lev = raw['zg'] - topo[..., None]
    expected = interp_to_level(lev, raw['ua'], np.float32(40),
                               method='log')
    np.testing.assert_allclose(log, expected, atol=1e-4)
    assert not np.allclose(np.asarray(lin), np.asarray(log), atol=1e-3)


def test_level_masks_bracketing():
    """get_level_masks picks the closest level below and above, with
    fallback when one side is empty."""
    lev = np.array([[10.0, 50.0, 200.0]])
    m1, m2 = get_level_masks(lev, 60.0)
    assert m1.tolist() == [[False, True, False]]
    assert m2.tolist() == [[False, False, True]]
    # all levels above the target: clamp (both masks hit the closest
    # level; matches reference utilities/interpolation.py:60-68)
    m1, m2 = get_level_masks(lev, 5.0)
    assert m1.tolist() == [[True, False, False]]
    assert m2.tolist() == [[True, False, False]]
    # all below: closest + second-closest (reference alt path)
    m1, m2 = get_level_masks(lev, 500.0)
    assert m1.tolist() == [[False, False, True]]
    assert m2.tolist() == [[False, True, False]]


def test_interp_warns_on_nan_levels():
    """NaN levels are unavailable candidates: warn and interpolate
    past them (reference: sup3r/utilities/interpolation.py docstring
    'Data will be interpolated or extrapolated past these NaN
    values')."""
    lev = np.array([[10.0, np.nan, 50.0]])
    var = np.array([[1.0, 99.0, 5.0]])
    with pytest.warns(UserWarning, match='NaN'):
        out = interp_to_level(lev, var, 40.0)
    # linear between the two FINITE levels; the NaN entry is ignored
    np.testing.assert_allclose(out, [4.0], rtol=1e-6)


def test_datahandler_height_interp_end_to_end(tmp_path):
    """DataHandler drives the full chain: load + zg/topography interp
    through the NCforCC-style registry with cache-ready output."""
    shape = (5, 5, 3)
    fp = make_fake_nc_file(str(tmp_path / 'gcm.nc'), shape,
                           ['ua', 'zg'], levels=[1000, 900])
    fp_orog = make_fake_nc_file(str(tmp_path / 'orog.nc'), shape,
                                ['orog'])
    dh = DataHandler([fp, fp_orog], features=['ua_40m'])
    assert dh.data['ua_40m'].shape == shape
    assert np.isfinite(np.asarray(dh.data['ua_40m'])).all()


def test_deriver_nan_levels_use_finite_candidates(tmp_path):
    """A NaN level entry (e.g. below-surface ERA5 height) is an
    unavailable CANDIDATE: the deriver interpolates from the finite
    levels around it (reference: derivers/base.py:379 warns and the
    Interpolator masks NaN levels) — nn-filling levels would inject a
    duplicate neighbor height and skew the two-closest selection."""
    raw = _setup_zg(tmp_path, heights=(10, 100, 300))
    # make the middle level unavailable at one column
    zg = np.array(raw['zg'])
    zg[2, 2, :, 1] = np.nan
    raw.data_vars['zg'] = zg
    ua = np.array(raw['ua'])
    # ua = height in meters, exactly: interp to 150m is then exact
    topo = np.asarray(raw['topography'])
    for i in range(3):
        ua[..., i] = zg[..., i] - topo
    raw.data_vars['ua'] = ua
    with pytest.warns(UserWarning):
        d = Deriver(raw, ['ua_150m'])
    out = np.asarray(d.data['ua_150m'])
    # normal columns: between 100 and 300 -> exactly 150
    np.testing.assert_allclose(out[0, 0], 150.0, atol=1e-3)
    # NaN-level column: finite candidates are 10 and 300 -> still 150
    # by linear interp between them (ua == height makes it exact)
    np.testing.assert_allclose(out[2, 2], 150.0, atol=1e-3)
