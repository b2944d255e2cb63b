"""Lazy (streaming) daily/CC handler compositions (VERDICT r4 #5):
``mode='lazy'`` for DailyDataHandler / H5WindCC / H5SolarCC /
DataHandlerNCforCC, bit-exact vs eager on small data.

Reference capability: the dask plane is lazy for every handler
(sup3r/preprocessing/data_handlers/base.py:293-396, nc_cc.py:160-240).
"""

import numpy as np
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

WIND_FEATS = ['temperature_2m', 'temperature_max_2m',
              'temperature_min_2m']
SOLAR_FEATS = ['clearsky_ratio', 'ghi', 'clearsky_ghi']


@pytest.fixture
def wind_pair(tmp_path):
    fp = make_fake_h5_file(
        str(tmp_path / 'wtk.h5'), (6, 6, 72), ['temperature_2m'],
        value_range=(-10, 30))
    eager = DataHandlerH5WindCC(fp, features=WIND_FEATS)
    lazy = DataHandlerH5WindCC(fp, features=WIND_FEATS, mode='lazy')
    return eager, lazy


@pytest.fixture
def solar_pair(tmp_path):
    fp = make_fake_h5_file(
        str(tmp_path / 'nsrdb.h5'), (8, 8, 48), ['ghi', 'clearsky_ghi'],
        start='2023-06-01', freq='h', scale_factor=1.0,
        value_range=(0, 1000))
    eager = DataHandlerH5SolarCC(fp, features=SOLAR_FEATS)
    lazy = DataHandlerH5SolarCC(fp, features=SOLAR_FEATS, mode='lazy')
    return eager, lazy


def _windows(shape, n_days):
    """A few representative member crops incl. edges."""
    s1, s2 = shape[:2]
    return [
        (slice(0, s1), slice(0, s2), slice(0, n_days)),
        (slice(1, s1 - 1), slice(2, s2), slice(1, n_days)),
        (slice(s1 - 3, s1), slice(0, 3), slice(n_days - 1, n_days)),
    ]


def test_wind_daily_hourly_bit_parity(wind_pair):
    eager, lazy = wind_pair
    assert lazy.daily.shape == eager.daily.shape
    assert lazy.hourly.shape == eager.hourly.shape
    assert list(lazy.daily.time_index) == list(eager.daily.time_index)
    for win in _windows(lazy.daily.shape[:2], lazy.daily.shape[2]):
        idx = (*win, WIND_FEATS)
        np.testing.assert_array_equal(
            np.asarray(eager.daily.sample(idx)),
            lazy.daily.sample(idx))
    hidx = (slice(0, 6), slice(1, 5), slice(3, 30), WIND_FEATS)
    np.testing.assert_array_equal(
        np.asarray(eager.hourly.sample(hidx)), lazy.hourly.sample(hidx))


def test_wind_partial_day_trim_matches(tmp_path):
    """60 h = 2.5 days: both modes trim to the 2 leading whole days."""
    fp = make_fake_h5_file(
        str(tmp_path / 'wtk.h5'), (4, 4, 60), ['temperature_2m'],
        value_range=(-10, 30))
    eager = DataHandlerH5WindCC(fp, features=['temperature_2m'])
    lazy = DataHandlerH5WindCC(fp, features=['temperature_2m'],
                               mode='lazy')
    assert lazy.hourly.shape == eager.hourly.shape == (4, 4, 48, 1)
    assert lazy.daily.shape == eager.daily.shape == (4, 4, 2, 1)
    idx = (slice(0, 4), slice(0, 4), slice(0, 2), ['temperature_2m'])
    np.testing.assert_array_equal(
        np.asarray(eager.daily.sample(idx)), lazy.daily.sample(idx))


def test_solar_csr_bit_parity(solar_pair):
    """Daily csr (totals-based) and hourly csr (full-extent night
    mask, precomputed as a per-timestep table in lazy mode) are
    bit-identical to eager, NaNs included."""
    eager, lazy = solar_pair
    for win in _windows(lazy.daily.shape[:2], lazy.daily.shape[2]):
        idx = (*win, SOLAR_FEATS)
        np.testing.assert_array_equal(
            np.asarray(eager.daily.sample(idx)),
            lazy.daily.sample(idx))
    hidx = (slice(2, 7), slice(0, 8), slice(0, 48), SOLAR_FEATS)
    he = np.asarray(eager.hourly.sample(hidx))
    hl = lazy.hourly.sample(hidx)
    np.testing.assert_array_equal(he, hl)
    # the night mask actually engaged (fake ghi has zeros -> NaNs)
    assert np.isnan(hl[..., 0]).any()


def test_solar_coarse_view_bit_parity(solar_pair):
    """The lazy s_enhance coarse view (DualSamplerCC's LR path) equals
    coarsening the eager daily array, including after normalization —
    eager order is normalize-then-coarsen."""
    from sup3r_tpu.ops import spatial_coarsening

    eager, lazy = solar_pair
    means = {f: 0.3 for f in SOLAR_FEATS}
    stds = {f: 0.7 for f in SOLAR_FEATS}
    eager.daily.normalize(means, stds)
    lazy.daily.normalize(means, stds)
    coarse = lazy.daily.coarsen(2)
    full = spatial_coarsening(np.asarray(eager.daily.data), 2,
                              obs_axis=False)
    idx = (slice(0, 4), slice(1, 3), slice(0, 2), SOLAR_FEATS)
    np.testing.assert_array_equal(
        full[idx[0], idx[1], idx[2]], coarse.sample(idx))
    np.testing.assert_array_equal(
        coarse.lat_lon,
        spatial_coarsening(eager.daily.lat_lon, 2, obs_axis=False))


def test_solar_helper_channels_not_exposed(tmp_path):
    """Requesting only clearsky_ratio: lazy members carry exactly the
    requested channel (eager adds then trims helpers), values equal."""
    fp = make_fake_h5_file(
        str(tmp_path / 'nsrdb.h5'), (6, 6, 48), ['ghi', 'clearsky_ghi'],
        start='2023-06-01', freq='h', scale_factor=1.0,
        value_range=(0, 1000))
    eager = DataHandlerH5SolarCC(fp, features=['clearsky_ratio'])
    lazy = DataHandlerH5SolarCC(fp, features=['clearsky_ratio'],
                                mode='lazy')
    assert lazy.daily.features == eager.daily.features == [
        'clearsky_ratio']
    assert lazy.hourly.features == ['clearsky_ratio']
    idx = (slice(0, 6), slice(0, 6), slice(0, 2), ['clearsky_ratio'])
    np.testing.assert_array_equal(
        np.asarray(eager.daily.sample(idx)), lazy.daily.sample(idx))


@pytest.fixture
def gcm_and_nsrdb(tmp_path):
    from tests.solar_qa.test_solar_qa import _make_fake_nsrdb

    gcm_fp = make_fake_nc_file(str(tmp_path / 'gcm.nc'), (6, 6, 4),
                               ['rsds', 'uas'], freq='D')
    nsrdb_fp = _make_fake_nsrdb(str(tmp_path / 'nsrdb.h5'),
                                (10, 10, 48))
    return gcm_fp, nsrdb_fp


def test_ncforcc_lazy_clearsky_bit_parity(gcm_and_nsrdb):
    """Lazy NCforCC: windowed clearsky_ghi regrid + precomputed
    full-extent per-pixel scale raster == the eager injection
    (reference nc_cc.py:160-241 semantics)."""
    gcm_fp, nsrdb_fp = gcm_and_nsrdb
    kwargs = dict(features=['clearsky_ratio', 'clearsky_ghi', 'rsds'],
                  nsrdb_source_fp=nsrdb_fp, nsrdb_agg=2)
    eager = DataHandlerNCforCC(gcm_fp, **kwargs)
    lazy = DataHandlerNCforCC(gcm_fp, mode='lazy', **kwargs)
    assert lazy.data.shape == eager.data.shape
    for idx in [
        (slice(0, 6), slice(0, 6), slice(0, 4), kwargs['features']),
        (slice(1, 4), slice(3, 6), slice(1, 3), ['clearsky_ratio']),
        (slice(4, 6), slice(0, 2), slice(0, 1), ['clearsky_ghi']),
    ]:
        np.testing.assert_array_equal(
            np.asarray(eager.data.sample(idx)), lazy.data.sample(idx))


def test_ncforcc_lazy_window_reads_no_regrid(gcm_and_nsrdb,
                                             monkeypatch):
    """Window reads must be pure indexing into the precomputed daily
    table: re-running the regrid (NSRDB open + KDTree + whole-year
    daily means) per sampled window put seconds of redundant I/O in
    the sampler hot path (round-5 review finding)."""
    import sup3r_tpu.preprocessing.data_handlers as dh_mod

    gcm_fp, nsrdb_fp = gcm_and_nsrdb
    lazy = DataHandlerNCforCC(
        gcm_fp, mode='lazy', features=['clearsky_ratio'],
        nsrdb_source_fp=nsrdb_fp, nsrdb_agg=2)

    def _boom(*a, **k):
        raise AssertionError('window read re-opened the NSRDB source')

    monkeypatch.setattr(dh_mod, 'LoaderH5', _boom)
    monkeypatch.setattr(dh_mod.DataHandlerNCforCC, '_regrid_clearsky',
                        staticmethod(_boom))
    out = lazy.data.sample(
        (slice(1, 4), slice(2, 5), slice(0, 2), ['clearsky_ratio']))
    assert np.isfinite(out).any()


def test_ncforcc_lazy_scale_override(gcm_and_nsrdb, tmp_path):
    """A precomputed clearsky_scale raster (.npy, the chunked_io
    preflight artifact) feeds the lazy var directly — no rsds pass."""
    gcm_fp, nsrdb_fp = gcm_and_nsrdb
    scale = np.full((6, 6), 1.5, dtype=np.float32)
    fp = str(tmp_path / 'scale.npy')
    np.save(fp, scale)
    kwargs = dict(features=['clearsky_ghi'], nsrdb_source_fp=nsrdb_fp,
                  nsrdb_agg=1)
    eager = DataHandlerNCforCC(gcm_fp, clearsky_scale=fp, **kwargs)
    lazy = DataHandlerNCforCC(gcm_fp, clearsky_scale=fp, mode='lazy',
                              **kwargs)
    idx = (slice(0, 6), slice(0, 6), slice(0, 4), ['clearsky_ghi'])
    np.testing.assert_array_equal(
        np.asarray(eager.data.sample(idx)), lazy.data.sample(idx))
    # wrong-shaped raster fails loudly in lazy mode too
    bad = str(tmp_path / 'bad.npy')
    np.save(bad, np.ones((3, 3), np.float32))
    with pytest.raises(ValueError, match='clearsky_scale raster'):
        DataHandlerNCforCC(gcm_fp, clearsky_scale=bad, mode='lazy',
                           **kwargs)


def test_ncforcc_lazy_rejects_smoothing(gcm_and_nsrdb):
    gcm_fp, nsrdb_fp = gcm_and_nsrdb
    with pytest.raises(NotImplementedError, match='nsrdb_smoothing'):
        DataHandlerNCforCC(
            gcm_fp, features=['clearsky_ratio'],
            nsrdb_source_fp=nsrdb_fp, nsrdb_smoothing=1.0, mode='lazy')


def test_daily_lazy_still_rejects_full_domain_remaps(tmp_path):
    """time_roll / hr_spatial_coarsen / cache_kwargs stay rejected for
    lazy daily handlers (full-domain remaps)."""
    fp = make_fake_h5_file(
        str(tmp_path / 'wtk.h5'), (4, 4, 48), ['temperature_2m'],
        value_range=(-10, 30))
    with pytest.raises(NotImplementedError, match='time_roll'):
        DataHandlerH5WindCC(fp, features=['temperature_2m'],
                            mode='lazy', time_roll=2)
