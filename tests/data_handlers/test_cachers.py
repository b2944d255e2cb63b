"""Cacher parity tests: h5 + nc formats, chunk specs, scale_factor
encoding, threaded writes, overwrite, and DataHandler cache reload
(reference: sup3r/writers/cachers.py:35-592; tests/derivers +
tests/data_handlers cache tests)."""

import os

import h5py
import numpy as np
import pandas as pd
import pytest

from sup3r_tpu.postprocessing.cachers import (
    Cacher,
    load_cached,
    parse_chunks,
)
from sup3r_tpu.preprocessing.grid import GridDataset


def _dset(shape=(6, 5, 8), features=('u_100m', 'v_100m')):
    rng = np.random.default_rng(0)
    data = rng.random((*shape, len(features))).astype(np.float32)
    lat = np.linspace(40, 39, shape[0])
    lon = np.linspace(-105, -104, shape[1])
    lat_lon = np.dstack(np.meshgrid(lat, lon, indexing='ij'))
    ti = pd.date_range('2023-01-01', periods=shape[2], freq='h')
    return GridDataset(data, list(features), lat_lon=lat_lon,
                       time_index=ti)


@pytest.mark.parametrize('ext', ['h5', 'nc'])
def test_cache_roundtrip(tmp_path, ext):
    """Both formats round-trip data, coords, and times exactly."""
    data = _dset()
    pattern = str(tmp_path / ('cache_{feature}.' + ext))
    cacher = Cacher(data, {'cache_pattern': pattern})
    assert len(cacher.out_files) == 2
    assert all(os.path.exists(fp) for fp in cacher.out_files)
    back = load_cached(pattern, ['u_100m', 'v_100m'])
    np.testing.assert_allclose(back.data, data.data, rtol=1e-6)
    np.testing.assert_allclose(back.lat_lon, data.lat_lon, rtol=1e-6)
    assert back.time_index.equals(data.time_index)
    # wildcard feature discovery
    again = load_cached(pattern, 'all')
    assert sorted(again.features) == ['u_100m', 'v_100m']


@pytest.mark.parametrize('ext', ['h5', 'nc'])
def test_cache_chunk_specs(tmp_path, ext):
    """Per-feature dims-dict chunk specs land in the file layout."""
    data = _dset()
    pattern = str(tmp_path / ('cache_{feature}.' + ext))
    chunks = {'u_100m': {'south_north': 3, 'west_east': 2, 'time': 4},
              'v_100m': {'south_north': 6, 'west_east': 5, 'time': 8}}
    Cacher(data, {'cache_pattern': pattern, 'chunks': chunks})
    with h5py.File(pattern.format(feature='u_100m'), 'r') as f:
        assert f['u_100m'].chunks == (3, 2, 4)
    with h5py.File(pattern.format(feature='v_100m'), 'r') as f:
        assert f['v_100m'].chunks == (6, 5, 8)


def test_parse_chunks_variants():
    shape = (10, 10, 20)
    # global tuple, clipped to shape
    assert parse_chunks('u_100m', (100, 5, 5), shape) == (10, 5, 5)
    # global dims dict
    assert parse_chunks(
        'u_100m', {'south_north': 2, 'west_east': 3, 'time': 4},
        shape) == (2, 3, 4)
    # missing dim -> auto
    assert parse_chunks('u_100m', {'time': 4}, shape) is True
    assert parse_chunks('u_100m', None, shape) is None
    # 'auto' means h5py auto-chunking, NOT contiguous (round-5
    # review finding: it returned None, writing contiguous layouts)
    assert parse_chunks('u_100m', 'auto', shape) is True


def test_scale_factor_encoding(tmp_path):
    """attrs scale_factor stores ints on disk; reload decodes."""
    data = _dset(features=('u_100m',))
    pattern = str(tmp_path / 'cache_{feature}.h5')
    Cacher(data, {'cache_pattern': pattern,
                  'attrs': {'u_100m': {'scale_factor': 0.001,
                                       'dtype': 'int16'}}})
    with h5py.File(pattern.format(feature='u_100m'), 'r') as f:
        assert f['u_100m'].dtype == np.int16
        assert f['u_100m'].attrs['scale_factor'] == 0.001
    back = load_cached(pattern, ['u_100m'])
    np.testing.assert_allclose(back.data, data.data, atol=6e-4)


def test_nc_cache_scale_factor_via_loader(tmp_path):
    """NC caches with scale_factor decode through LoaderNC too."""
    data = _dset(features=('u_100m',))
    pattern = str(tmp_path / 'cache_{feature}.nc')
    Cacher(data, {'cache_pattern': pattern,
                  'attrs': {'u_100m': {'scale_factor': 0.001}}})
    back = load_cached(pattern, ['u_100m'])
    np.testing.assert_allclose(back.data, data.data, atol=6e-4)


def test_max_workers_parallel_write(tmp_path):
    """max_workers>1 writes feature files concurrently and matches."""
    data = _dset(shape=(8, 7, 12),
                 features=('u_100m', 'v_100m', 'u_10m', 'v_10m'))
    pattern = str(tmp_path / 'cache_{feature}.h5')
    Cacher(data, {'cache_pattern': pattern, 'max_workers': 4})
    back = load_cached(pattern, list(data.features))
    np.testing.assert_allclose(back.data, data.data, rtol=1e-6)


def test_overwrite_semantics(tmp_path):
    """Existing files are kept unless overwrite=True."""
    data = _dset(features=('u_100m',))
    pattern = str(tmp_path / 'cache_{feature}.h5')
    fp = pattern.format(feature='u_100m')
    Cacher(data, {'cache_pattern': pattern})
    mtime = os.path.getmtime(fp)
    stale = GridDataset(np.zeros_like(data.data), data.features,
                        lat_lon=data.lat_lon,
                        time_index=data.time_index)
    Cacher(stale, {'cache_pattern': pattern})  # skipped
    back = load_cached(pattern, ['u_100m'])
    np.testing.assert_allclose(back.data, data.data, rtol=1e-6)
    Cacher(stale, {'cache_pattern': pattern, 'overwrite': True})
    back = load_cached(pattern, ['u_100m'])
    assert float(np.abs(back.data).max()) == 0.0
    assert os.path.getmtime(fp) >= mtime


def test_bad_extension_raises(tmp_path):
    data = _dset(features=('u_100m',))
    with pytest.raises(AssertionError, match='.h5 or .nc'):
        Cacher(data, {'cache_pattern': str(tmp_path / 'c_{feature}.zarr')})


def test_data_handler_nc_cache_reload(tmp_path):
    """DataHandler writes an NC cache then reloads from it (cache hit
    short-circuits rasterize+derive; reference:
    data_handlers/base.py:210-265)."""
    from sup3r_tpu.preprocessing.data_handlers import DataHandler
    from sup3r_tpu.utilities.test_helpers import make_fake_nc_file

    fp = make_fake_nc_file(str(tmp_path / 'wind.nc'), (7, 6, 10),
                           ['u_100m', 'v_100m'])
    pattern = str(tmp_path / 'cache_{feature}.nc')
    dh = DataHandler(fp, features=['u_100m', 'v_100m'],
                     cache_kwargs={'cache_pattern': pattern,
                                   'max_workers': 2})
    assert os.path.exists(pattern.format(feature='u_100m'))
    dh2 = DataHandler(fp, features=['u_100m', 'v_100m'],
                      cache_kwargs={'cache_pattern': pattern})
    assert dh2.rasterizer is None  # cache hit: no rasterize pass
    np.testing.assert_allclose(np.asarray(dh2.data.data),
                               np.asarray(dh.data.data), rtol=1e-6)
    assert dh2.data.time_index.equals(dh.data.time_index)


def test_derived_feature_caching_h5(tmp_path):
    """DERIVED features (windspeed from u/v) cache to H5 and reload
    without re-deriving (reference:
    tests/derivers/test_deriver_caching.py:82-140)."""
    from sup3r_tpu.preprocessing.data_handlers import DataHandler
    from sup3r_tpu.utilities.test_helpers import make_fake_nc_file

    fp = make_fake_nc_file(str(tmp_path / 'wind.nc'), (7, 6, 10),
                           ['u100', 'v100'])
    pattern = str(tmp_path / 'cache_{feature}.h5')
    dh = DataHandler(fp, features=['windspeed_100m'],
                     cache_kwargs={'cache_pattern': pattern})
    assert os.path.exists(pattern.format(feature='windspeed_100m'))
    dh2 = DataHandler(fp, features=['windspeed_100m'],
                      cache_kwargs={'cache_pattern': pattern})
    assert dh2.rasterizer is None
    np.testing.assert_allclose(np.asarray(dh2.data['windspeed_100m']),
                               np.asarray(dh.data['windspeed_100m']),
                               rtol=1e-5)


def test_daily_dh_caching_roundtrip(tmp_path):
    """DailyDataHandler caches/reloads through cache_kwargs (reference:
    tests/derivers/test_deriver_caching.py:185-270)."""
    from sup3r_tpu.preprocessing.data_handlers import (
        DataHandlerH5WindCC,
    )
    from sup3r_tpu.utilities.test_helpers import make_fake_h5_file

    fp = make_fake_h5_file(str(tmp_path / 'wtk.h5'), (6, 6, 48),
                           ['temperature_2m'], value_range=(-10, 30))
    pattern = str(tmp_path / 'cc_{feature}.h5')
    dh = DataHandlerH5WindCC(fp, features=['temperature_2m'],
                             cache_kwargs={'cache_pattern': pattern})
    assert os.path.exists(pattern.format(feature='temperature_2m'))
    dh2 = DataHandlerH5WindCC(fp, features=['temperature_2m'],
                              cache_kwargs={'cache_pattern': pattern})
    np.testing.assert_allclose(
        np.asarray(dh2.hourly['temperature_2m']),
        np.asarray(dh.hourly['temperature_2m']), atol=1e-2)
    np.testing.assert_allclose(
        np.asarray(dh2.daily['temperature_2m']),
        np.asarray(dh.daily['temperature_2m']), atol=1e-2)
    assert dh2.daily.time_index.equals(dh.daily.time_index)


def test_solar_cc_trim_caching_roundtrip(tmp_path):
    """H5SolarCC trims auto-added ghi/clearsky_ghi helpers from its
    exposed data but caches the UNTRIMMED hourly member, so a cache
    reload can rederive the totals-based daily clearsky_ratio instead
    of silently degrading to a mean of hourly ratios."""
    from sup3r_tpu.preprocessing.data_handlers import (
        DataHandlerH5SolarCC,
    )
    from sup3r_tpu.utilities.test_helpers import make_fake_h5_file

    fp = make_fake_h5_file(
        str(tmp_path / 'nsrdb.h5'), (5, 5, 48), ['ghi', 'clearsky_ghi'],
        start='2023-06-01', freq='h', scale_factor=1.0,
        value_range=(0, 1000))
    pattern = str(tmp_path / 'solar_{feature}.h5')
    dh = DataHandlerH5SolarCC(fp, features=['clearsky_ratio'],
                              cache_kwargs={'cache_pattern': pattern})
    assert dh.daily.features == ['clearsky_ratio']
    # helper channels are in the cache even though trimmed from .data
    assert os.path.exists(pattern.format(feature='ghi'))
    assert os.path.exists(pattern.format(feature='clearsky_ghi'))
    dh2 = DataHandlerH5SolarCC(fp, features=['clearsky_ratio'],
                               cache_kwargs={'cache_pattern': pattern})
    assert dh2.daily.features == ['clearsky_ratio']
    np.testing.assert_allclose(
        np.asarray(dh2.daily['clearsky_ratio']),
        np.asarray(dh.daily['clearsky_ratio']), atol=1e-3,
        equal_nan=True)


def test_daily_dh_caching_with_hr_coarsen(tmp_path):
    """DailyDataHandler + hr_spatial_coarsen + caching: the cache
    stores the coarsened hourly member and a cache hit rebuilds the
    matching daily view (reference:
    tests/derivers/test_deriver_caching.py:230-270)."""
    from sup3r_tpu.preprocessing.data_handlers import (
        DataHandlerH5WindCC,
    )
    from sup3r_tpu.utilities.test_helpers import make_fake_h5_file

    fp = make_fake_h5_file(str(tmp_path / 'wtk.h5'), (12, 12, 72),
                           ['windspeed_100m', 'winddirection_100m'],
                           value_range=(0, 20))
    pattern = str(tmp_path / 'cc_{feature}.h5')
    kw = {'features': ['u_100m', 'v_100m'], 'hr_spatial_coarsen': 2,
          'cache_kwargs': {'cache_pattern': pattern, 'max_workers': 1}}
    d1 = DataHandlerH5WindCC(fp, **kw)
    assert d1.hourly.data.shape[:2] == (6, 6)
    assert d1.daily.data.shape == (6, 6, 3, 2)
    d2 = DataHandlerH5WindCC(fp, **kw)
    assert np.array_equal(np.asarray(d1.hourly.data),
                          np.asarray(d2.hourly.data))
    np.testing.assert_allclose(np.asarray(d1.daily.data),
                               np.asarray(d2.daily.data), atol=1e-6)
    assert d2.daily.time_index.equals(d1.daily.time_index)
