"""Loader file-format matrix (mirrors reference
tests/loaders/test_file_loading.py): value standardization (K->C),
longitude wrapping, level inversion, packed fill values, exotic
calendars, time-independent files, and flattened-H5 edge cases."""

import h5py
import numpy as np
import pandas as pd
import pytest

from sup3r_tpu.preprocessing.loaders import (
    Loader,
    LoaderH5,
    LoaderNC,
    decode_cf_time,
    get_source_type,
)
from sup3r_tpu.utilities.test_helpers import (
    make_fake_h5_file,
    make_fake_nc4_file,
    make_fake_nc_file,
)


def test_standard_values_k_to_c(tmp_path):
    """Variables with units 'K' load as Celsius (reference:
    tests/loaders/test_file_loading.py:60-72)."""
    fp = str(tmp_path / 'ta.nc')
    make_fake_nc4_file(fp, (6, 7, 4), ['ta'],
                       var_attrs={'ta': {'units': np.bytes_('K')}})
    with h5py.File(fp, 'r') as f:
        raw = f['ta'][:]
    dset = LoaderNC(fp).data
    np.testing.assert_allclose(
        dset['ta'], np.transpose(raw, (1, 2, 0)) - 273.15, rtol=1e-5)


def test_standard_values_k_to_c_lazy(tmp_path):
    """The K->C standardization applies identically through the lazy
    windowed-read path."""
    fp = str(tmp_path / 'ta.nc')
    make_fake_nc4_file(fp, (6, 7, 4), ['ta'],
                       var_attrs={'ta': {'units': np.bytes_('K')}})
    eager = np.asarray(LoaderNC(fp).data['ta'])
    lazy = LoaderNC(fp, lazy=True).data.data_vars['ta']
    np.testing.assert_allclose(np.asarray(lazy), eager, rtol=1e-6)
    win = lazy.isel({'south_north': slice(1, 4),
                     'west_east': slice(2, 5)})
    np.testing.assert_allclose(win, eager[1:4, 2:5], rtol=1e-6)


def test_lon_range_wrap(tmp_path):
    """0-360 longitudes standardize to [-180, 180] (reference:
    tests/loaders/test_file_loading.py:101-116)."""
    fp = str(tmp_path / 'lons.nc')
    make_fake_nc4_file(fp, (5, 8, 3), ['u_100m'],
                       lon_range=(200.0, 240.0))
    dset = LoaderNC(fp).data
    lons = dset.lat_lon[..., 1]
    assert (lons >= -180).all() and (lons <= 180).all()
    np.testing.assert_allclose(lons[0], np.linspace(200, 240, 8) - 360,
                               atol=1e-4)


def test_level_inversion(tmp_path):
    """Ascending pressure levels are flipped so the surface-most level
    comes first, along with the data (reference:
    tests/loaders/test_file_loading.py:118-143)."""
    fp = str(tmp_path / 'levels.nc')
    make_fake_nc4_file(fp, (5, 5, 3), ['zg'], levels=[100, 500, 850])
    with h5py.File(fp, 'r') as f:
        raw = f['zg'][:]  # (t, level, lat, lon), levels ascending
    dset = LoaderNC(fp).data
    np.testing.assert_array_equal(dset.levels, [850, 500, 100])
    # canonical order (s1, s2, t, level), levels flipped
    expect = np.transpose(raw[:, ::-1], (2, 3, 0, 1))
    np.testing.assert_allclose(dset['zg'], expect, rtol=1e-6)


def test_level_inversion_lazy_window(tmp_path):
    """Level flips survive lazy windowed reads."""
    fp = str(tmp_path / 'levels.nc')
    make_fake_nc4_file(fp, (6, 6, 4), ['zg'], levels=[100, 500, 850])
    eager = np.asarray(LoaderNC(fp).data['zg'])
    lazy = LoaderNC(fp, lazy=True).data.data_vars['zg']
    win = lazy.isel({'south_north': slice(2, 5),
                     'west_east': slice(0, 3)})
    np.testing.assert_allclose(win, eager[2:5, 0:3], rtol=1e-6)


def test_packed_fill_value_masked_before_scaling(tmp_path):
    """_FillValue comparison happens in packed (integer) space, then
    scale/offset applies — a packed fill that scales onto a valid
    float must still be NaN."""
    fp = str(tmp_path / 'packed.nc')
    make_fake_nc4_file(fp, (4, 4, 3), ['pr'], scale_factor=1e-4,
                       fill_value=-32767)
    dset = LoaderNC(fp).data
    arr = np.asarray(dset['pr'])
    assert np.isnan(arr[0, 0, 0])
    assert np.isfinite(arr[1:]).all()
    # lazy path agrees
    lazy = np.asarray(LoaderNC(fp, lazy=True).data['pr'])
    np.testing.assert_array_equal(np.isnan(lazy), np.isnan(arr))
    np.testing.assert_allclose(lazy[~np.isnan(lazy)],
                               arr[~np.isnan(arr)], rtol=1e-6)


def test_noleap_calendar_loading(tmp_path):
    """A noleap-calendar file spanning Feb 28 -> Mar 1 skips Feb 29 in
    the decoded time index."""
    fp = str(tmp_path / 'noleap.nc')
    make_fake_nc4_file(fp, (4, 4, 48), ['ta'], start='2020-02-28',
                       freq='h', calendar='noleap')
    ti = LoaderNC(fp).data.time_index
    assert len(ti) == 48
    assert not ((ti.month == 2) & (ti.day == 29)).any()
    assert ti[0] == pd.Timestamp('2020-02-28')
    assert (ti.month == 3).any()


def test_360_day_calendar_decode():
    """360-day calendars decode with 30-day months."""
    ti = decode_cf_time(np.arange(35), 'days since 2000-01-01',
                        calendar='360_day')
    assert ti[0] == pd.Timestamp('2000-01-01')
    # day 30 rolls into Feb 1 (every month has 30 days)
    assert ti[30] == pd.Timestamp('2000-02-01')


def test_time_independent_loading(tmp_path):
    """Files with no time dimension (static rasters like topography)
    load with time_index=None (reference:
    tests/loaders/test_file_loading.py:23-44)."""
    fp = str(tmp_path / 'topo.nc')
    make_fake_nc4_file(fp, (8, 9, 1), ['topography'],
                       include_time=False)
    dset = LoaderNC(fp).data
    assert dset.time_index is None
    assert dset['topography'].shape == (8, 9)
    assert dset.grid_shape == (8, 9)


def test_h5_tiny_value_range_scale_factor(tmp_path):
    """Small-magnitude features (e.g. pr ~1e-4) survive the uint16
    round trip when the scale factor suits the range."""
    fp = str(tmp_path / 'pr.h5')
    make_fake_h5_file(fp, (5, 5, 10), ['pr'], scale_factor=1e7,
                      value_range=(0, 3e-3))
    arr = LoaderH5(fp).get('pr')
    assert arr.max() <= 3e-3 and arr.min() >= 0
    assert np.std(arr) > 0  # not quantized to mush


def test_h5_time_slice_and_gid_reads(tmp_path):
    """The flattened-H5 loader's windowed (time, gid) reads match full
    reads."""
    fp = str(tmp_path / 'ws.h5')
    make_fake_h5_file(fp, (6, 7, 12), ['windspeed_100m'])
    loader = LoaderH5(fp)
    full = loader.get('windspeed_100m')
    sub = loader.get('windspeed_100m', time_slice=slice(3, 9),
                     gids=np.array([0, 5, 11]))
    np.testing.assert_allclose(sub, full[3:9][:, [0, 5, 11]],
                               rtol=1e-6)


def test_source_type_detection(tmp_path):
    assert get_source_type('a.h5') == 'h5'
    assert get_source_type(['a.nc', 'b.nc']) == 'nc'
    assert get_source_type('some/path/*.h5') == 'h5'


def test_generic_loader_dispatch(tmp_path):
    """Loader() dispatches on file type."""
    nc = str(tmp_path / 'x.nc')
    h5 = str(tmp_path / 'x.h5')
    make_fake_nc_file(nc, (4, 4, 3), ['u_100m'])
    make_fake_h5_file(h5, (4, 4, 3), ['windspeed_100m'])
    assert 'u_100m' in Loader(nc).data.features
    assert 'windspeed_100m' in Loader(h5).features


def test_multifile_unsorted_time_concat(tmp_path):
    """Two files given newest-first still concat into a sorted time
    index with matching data."""
    f1 = str(tmp_path / 'jan.nc')
    f2 = str(tmp_path / 'feb.nc')
    make_fake_nc4_file(f1, (4, 4, 5), ['ta'], start='2023-01-01')
    make_fake_nc4_file(f2, (4, 4, 5), ['ta'], start='2023-02-01')
    a = LoaderNC([f1, f2]).data
    b = LoaderNC([f2, f1]).data
    assert a.time_index.is_monotonic_increasing
    assert b.time_index.is_monotonic_increasing
    np.testing.assert_allclose(np.asarray(a['ta']),
                               np.asarray(b['ta']), rtol=1e-6)


def test_nc3_scipy_backend(tmp_path):
    """NetCDF3 files load through the scipy backend with identical
    standardization (ascending lats flipped)."""
    fp = str(tmp_path / 'nc3.nc')
    make_fake_nc_file(fp, (5, 6, 4), ['u_100m'], ascending_lats=True)
    dset = LoaderNC(fp).data
    lat = dset.lat_lon[..., 0]
    assert lat[0, 0] > lat[-1, 0]
    assert dset['u_100m'].shape == (5, 6, 4)


def test_360_day_february_clamps():
    """360-day Feb 29/30 don't exist in the Gregorian target: they
    clamp to the month's last real day instead of crashing (found by
    review: pd.Timestamp(month=2, day=30) raised)."""
    # non-leap year: days 58/59 of 2021 = 360-cal Feb 29/30
    ti = decode_cf_time(np.arange(70.0), 'days since 2021-01-01',
                        calendar='360_day')
    assert len(ti) == 70
    assert ti[57] == pd.Timestamp('2021-02-28')
    assert ti[58] == pd.Timestamp('2021-02-28')  # Feb 29 clamped
    assert ti[59] == pd.Timestamp('2021-02-28')  # Feb 30 clamped
    assert ti[60] == pd.Timestamp('2021-03-01')
    # leap year keeps Feb 29
    ti = decode_cf_time(np.arange(70.0), 'days since 2020-01-01',
                        calendar='360_day')
    assert ti[58] == pd.Timestamp('2020-02-29')
    assert ti[59] == pd.Timestamp('2020-02-29')  # Feb 30 clamped
