"""Climate-change data handler depth (mirrors reference
tests/data_handlers/test_dh_nc_cc.py:24-254 + test_dh_h5_cc.py):
NSRDB clearsky regrid aggregation/scaling knobs, daily csr totals
semantics, and daily min/max/total column handling."""

import numpy as np
import pandas as pd
import pytest

from sup3r_tpu.preprocessing.data_handlers import (
    DataHandlerH5SolarCC,
    DataHandlerH5WindCC,
    DataHandlerNCforCC,
)
from sup3r_tpu.utilities.test_helpers import (
    make_fake_h5_file,
    make_fake_nc_file,
)
from tests.solar_qa.test_solar_qa import _make_fake_nsrdb


@pytest.fixture
def gcm_and_nsrdb(tmp_path):
    gcm_fp = make_fake_nc_file(str(tmp_path / 'gcm.nc'), (6, 6, 4),
                               ['rsds'], freq='D')
    nsrdb_fp = _make_fake_nsrdb(str(tmp_path / 'nsrdb.h5'),
                                (12, 12, 96), start='2023-01-01')
    return gcm_fp, nsrdb_fp


def test_clearsky_ghi_rsds_max_scaling(gcm_and_nsrdb):
    """Regridded clearsky_ghi is scaled PER SPATIAL PIXEL so its
    time-max matches the rsds time-max at that pixel (reference:
    nc_cc.py:231-240 scale_clearsky_ghi uses max(dim='time'))."""
    gcm_fp, nsrdb_fp = gcm_and_nsrdb
    dh = DataHandlerNCforCC(gcm_fp,
                            features=['clearsky_ratio'],
                            nsrdb_source_fp=nsrdb_fp)
    cs = np.asarray(dh.rasterizer.data['clearsky_ghi'])
    rsds = np.asarray(dh.rasterizer.data['rsds'])
    np.testing.assert_allclose(np.nanmax(cs, axis=-1),
                               np.nanmax(rsds, axis=-1), rtol=1e-4)
    csr = np.asarray(dh.data['clearsky_ratio'])
    assert (csr[np.isfinite(csr)] >= 0).all()
    assert (csr[np.isfinite(csr)] <= 1).all()


def test_clearsky_scale_override(gcm_and_nsrdb):
    """An explicit clearsky_scale (scalar or per-pixel raster, the
    chunked_io preflight artifact) overrides the window-local per-pixel
    max ratio."""
    gcm_fp, nsrdb_fp = gcm_and_nsrdb

    def _cs(**kw):
        dh = DataHandlerNCforCC(gcm_fp, features=['clearsky_ratio'],
                                nsrdb_source_fp=nsrdb_fp, **kw)
        return np.asarray(dh.rasterizer.data['clearsky_ghi'])

    cs2 = _cs(clearsky_scale=2.0)
    cs4 = _cs(clearsky_scale=4.0)
    # scalar override: same unscaled regrid, exactly the given factor
    np.testing.assert_allclose(cs4, 2.0 * cs2, rtol=1e-6)

    # per-pixel raster override: each pixel column gets its own factor
    s1, s2 = cs2.shape[:2]
    raster = (1.0 + np.arange(s1 * s2).reshape(s1, s2)
              ).astype(np.float32)
    cs_r = _cs(clearsky_scale=raster)
    np.testing.assert_allclose(
        cs_r, (cs2 / 2.0) * raster[:, :, None], rtol=1e-5)

    # a wrongly-shaped raster is a loud error, not silent broadcast
    with pytest.raises(ValueError, match='clearsky_scale'):
        _cs(clearsky_scale=np.ones((s1 + 1, s2)))


def test_nsrdb_agg_changes_regrid(gcm_and_nsrdb):
    """nsrdb_agg > 1 averages more neighbors -> different raster."""
    gcm_fp, nsrdb_fp = gcm_and_nsrdb
    cs1 = DataHandlerNCforCC._regrid_clearsky(
        nsrdb_fp, 1, np.array([[39.5, -105.0], [39.6, -104.8]]),
        pd.date_range('2023-01-01', periods=4, freq='D'))
    cs4 = DataHandlerNCforCC._regrid_clearsky(
        nsrdb_fp, 4, np.array([[39.5, -105.0], [39.6, -104.8]]),
        pd.date_range('2023-01-01', periods=4, freq='D'))
    assert cs1.shape == cs4.shape == (4, 2)
    assert not np.allclose(cs1, cs4)


def test_missing_nsrdb_source_keeps_features(gcm_and_nsrdb):
    """Without an nsrdb_source_fp, clearsky_ghi is not injected and
    requesting clearsky_ratio fails loudly."""
    gcm_fp, _ = gcm_and_nsrdb
    with pytest.raises(Exception):
        DataHandlerNCforCC(gcm_fp, features=['clearsky_ratio'])


def test_daily_handler_reductions(tmp_path):
    """DailyDataHandler: plain features daily-mean; *_max/*_min/total
    features use their own reductions (reference:
    data_handlers/base.py:265-341)."""
    fp = make_fake_h5_file(
        str(tmp_path / 'wtk.h5'), (5, 5, 72),
        ['temperature_2m'], value_range=(-10, 30))
    dh = DataHandlerH5WindCC(fp, features=['temperature_2m',
                                           'temperature_max_2m',
                                           'temperature_min_2m'])
    hourly = np.asarray(dh.hourly['temperature_2m'])
    daily_mean = np.asarray(dh.daily['temperature_2m'])
    daily_max = np.asarray(dh.daily['temperature_max_2m'])
    daily_min = np.asarray(dh.daily['temperature_min_2m'])
    assert daily_mean.shape[-1] == 3  # 72 h -> 3 days
    blocks = hourly.reshape(5, 5, 3, 24)
    np.testing.assert_allclose(daily_mean, blocks.mean(-1), atol=1e-4)
    np.testing.assert_allclose(daily_max, blocks.max(-1), atol=1e-4)
    np.testing.assert_allclose(daily_min, blocks.min(-1), atol=1e-4)
    assert (daily_max >= daily_mean - 1e-4).all()
    assert (daily_min <= daily_mean + 1e-4).all()


def test_solar_cc_daily_csr_is_total_ratio(tmp_path):
    """Daily clearsky_ratio = sum(ghi)/sum(cs_ghi), NOT the mean of
    hourly ratios (reference: data_handlers/base.py:341)."""
    fp = make_fake_h5_file(
        str(tmp_path / 'nsrdb.h5'), (6, 6, 48),
        ['ghi', 'clearsky_ghi'], start='2023-06-01', freq='h',
        scale_factor=1.0, value_range=(0, 1000))
    full = DataHandlerH5SolarCC(
        fp, features=['clearsky_ratio', 'ghi', 'clearsky_ghi'])
    ghi = np.asarray(full.daily['ghi'])
    cs = np.asarray(full.daily['clearsky_ghi'])
    csr = np.asarray(full.daily['clearsky_ratio'])
    expect = np.where(cs > 0, ghi / cs, np.nan)
    np.testing.assert_allclose(csr, expect, rtol=1e-5, equal_nan=True)

    # auto-added ghi/clearsky_ghi helpers are trimmed back to the
    # requested features (reference: base.py:376-377), but the csr
    # values still come from the totals ratio
    dh = DataHandlerH5SolarCC(fp, features=['clearsky_ratio'])
    assert dh.daily.features == ['clearsky_ratio']
    assert dh.hourly.features == ['clearsky_ratio']
    np.testing.assert_allclose(
        np.asarray(dh.daily['clearsky_ratio']), csr, rtol=1e-5,
        equal_nan=True)


def test_nsrdb_smoothing_applies(gcm_and_nsrdb):
    """nsrdb_smoothing gaussian-filters the regridded clearsky raster
    (the upstream reference documents this kwarg but never applies
    it; here it works)."""
    gcm_fp, nsrdb_fp = gcm_and_nsrdb
    plain = DataHandlerNCforCC(gcm_fp, features=['clearsky_ratio'],
                               nsrdb_source_fp=nsrdb_fp)
    smooth = DataHandlerNCforCC(gcm_fp, features=['clearsky_ratio'],
                                nsrdb_source_fp=nsrdb_fp,
                                nsrdb_smoothing=2.0)
    cs_p = np.asarray(plain.rasterizer.data['clearsky_ghi'])
    cs_s = np.asarray(smooth.rasterizer.data['clearsky_ghi'])
    assert cs_p.shape == cs_s.shape
    assert not np.allclose(cs_p, cs_s)
    # smoothing reduces spatial variance at every timestep
    var_p = cs_p.var(axis=(0, 1))
    var_s = cs_s.var(axis=(0, 1))
    assert (var_s <= var_p + 1e-6).all()


def test_surf_min_max_vars(tmp_path):
    """Daily min/max training variables: hourly member aliases the
    base feature (registry maps *_min_*/*_max_* -> base), the daily
    member applies the min/max reduction, and stats are equal across
    the variants (reference:
    tests/batch_handlers/test_bh_h5_cc.py:306 test_surf_min_max_vars)."""
    from sup3r_tpu.preprocessing.data_handlers import (
        DataHandlerH5WindCC,
    )
    from sup3r_tpu.preprocessing.stats import StatsCollection
    from sup3r_tpu.utilities.test_helpers import make_fake_h5_file

    fp = make_fake_h5_file(
        str(tmp_path / 'wtk.h5'), (6, 6, 72),
        ['temperature_2m', 'relativehumidity_2m'],
        value_range=(0, 30))
    feats = ['temperature_2m', 'temperature_min_2m',
             'temperature_max_2m']
    dh = DataHandlerH5WindCC(fp, features=feats)
    d_mean = np.asarray(dh.daily['temperature_2m'])
    d_min = np.asarray(dh.daily['temperature_min_2m'])
    d_max = np.asarray(dh.daily['temperature_max_2m'])
    assert (d_min <= d_mean).all() and (d_mean <= d_max).all()
    assert (d_min < d_max).any()
    # hourly member aliases the base series -> identical stats
    stats = StatsCollection([dh])
    assert (stats.means['temperature_2m']
            == stats.means['temperature_min_2m']
            == stats.means['temperature_max_2m'])
    assert (stats.stds['temperature_2m']
            == stats.stds['temperature_min_2m']
            == stats.stds['temperature_max_2m'])
