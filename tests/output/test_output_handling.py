"""Output writing + collection (mirrors reference tests/output/)."""

import os

import h5py
import numpy as np
import pandas as pd
import pytest

from sup3r_tpu.ops import invert_uv
from sup3r_tpu.postprocessing.collectors import CollectorH5, CollectorNC
from sup3r_tpu.postprocessing.writers import (
    OutputHandler,
    OutputHandlerH5,
    OutputHandlerNC,
)
from sup3r_tpu.preprocessing.loaders import LoaderNC
from sup3r_tpu.utilities import RANDOM_GENERATOR


def _grid(s1, s2, lat0=40.0, lat1=39.0, lon0=-105.0, lon1=-104.0):
    lat = np.linspace(lat0, lat1, s1)
    lon = np.linspace(lon0, lon1, s2)
    return np.dstack(np.meshgrid(lat, lon, indexing='ij'))


def test_get_lat_lon_enhancement():
    lr = _grid(4, 4)
    hr = OutputHandler.get_lat_lon(lr.copy(), (8, 8))
    assert hr.shape == (8, 8, 2)
    # monotonic, within extrapolated bounds
    assert np.all(np.diff(hr[:, 0, 0]) < 0)
    assert np.all(np.diff(hr[0, :, 1]) > 0)
    # coarsening hr coords back recovers lr coords (cell centers)
    from sup3r_tpu.ops import spatial_coarsening

    back = spatial_coarsening(hr, 2, obs_axis=False)
    np.testing.assert_allclose(back, lr, atol=1e-4)


def test_get_lat_lon_180_wrap():
    # lons increasing through the 180 -> -180 boundary
    lat = np.linspace(40, 39, 4)
    lon = ((178.0 + np.arange(4) * 1.5 + 180) % 360) - 180
    lr = np.dstack(np.meshgrid(lat, lon, indexing='ij'))
    hr = OutputHandler.get_lat_lon(lr.copy(), (8, 8))
    assert hr[..., 1].min() >= -180 and hr[..., 1].max() <= 180
    # no discontinuity jump bigger than the grid span
    lons = (hr[0, :, 1] + 360) % 360
    assert np.all(np.diff(lons) > 0)


def test_get_times():
    lr_times = pd.date_range('2023-01-01', periods=5, freq='h')
    hr = OutputHandler.get_times(lr_times, 20)
    assert len(hr) == 20
    assert hr[0] == lr_times[0]
    assert hr[1] - hr[0] == pd.Timedelta(minutes=15)


def test_get_times_leap_year():
    lr_times = pd.date_range('2020-02-28', periods=2, freq='D')
    # no leap day in input -> none synthesized... input here contains
    # feb 28 + 29; keep leap day
    hr = OutputHandler.get_times(lr_times, 48)
    assert len(hr) == 48


def test_h5_write_inverts_uv(tmp_path):
    data = RANDOM_GENERATOR.random((6, 6, 4, 2)).astype(np.float32) * 10
    lat_lon = _grid(6, 6)
    times = pd.date_range('2023-01-01', periods=4, freq='h')
    out_file = str(tmp_path / 'out_000000_000000.h5')
    expected_ws, expected_wd = invert_uv(data[..., 0], data[..., 1],
                                         lat_lon)
    OutputHandlerH5._write_output(
        data.copy(), ['u_100m', 'v_100m'], lat_lon, times, out_file)
    with h5py.File(out_file, 'r') as f:
        ws = f['windspeed_100m'][:] / f['windspeed_100m'].attrs[
            'scale_factor']
        wd = f['winddirection_100m'][:] / f['winddirection_100m'].attrs[
            'scale_factor']
    np.testing.assert_allclose(
        ws, expected_ws.reshape(36, 4).T, atol=0.01)
    np.testing.assert_allclose(
        np.sin(np.radians(wd)),
        np.sin(np.radians(expected_wd.reshape(36, 4).T)), atol=0.01)


def test_collect_h5(tmp_path):
    """Write 4 spatial chunk files + 2 time chunks, collect, compare to
    ground truth (reference collect_check semantics, atol=0.01)."""
    s1, s2, t = 8, 8, 8
    data = (RANDOM_GENERATOR.random((s1, s2, t, 1)) * 10).astype(
        np.float32)
    lat_lon = _grid(s1, s2)
    times = pd.date_range('2023-01-01', periods=t, freq='h')
    gids = np.arange(s1 * s2).reshape(s1, s2)

    chunks = []
    for t_idx, t_slice in enumerate([slice(0, 4), slice(4, 8)]):
        for s_idx, (ss1, ss2) in enumerate(
                [(slice(0, 4), slice(0, 4)), (slice(0, 4), slice(4, 8)),
                 (slice(4, 8), slice(0, 4)),
                 (slice(4, 8), slice(4, 8))]):
            fp = str(tmp_path / f'chunk_{t_idx:06d}_{s_idx:06d}.h5')
            OutputHandlerH5._write_output(
                data[ss1, ss2, t_slice].copy(), ['windspeed_100m'],
                lat_lon[ss1, ss2], times[t_slice], fp,
                gids=gids[ss1, ss2])
            chunks.append(fp)

    out_file = str(tmp_path / 'collected.h5')
    CollectorH5.collect(chunks, out_file)
    with h5py.File(out_file, 'r') as f:
        ws = f['windspeed_100m'][:] / f['windspeed_100m'].attrs[
            'scale_factor']
        meta = f['meta'][:]
        assert ws.shape == (t, s1 * s2)
        assert len(meta) == s1 * s2
    truth = data[..., 0].reshape(s1 * s2, t).T
    np.testing.assert_allclose(ws, truth, atol=0.01)


def test_collect_nc(tmp_path):
    s1, s2, t = 6, 6, 4
    data = RANDOM_GENERATOR.random((s1, s2, t, 1)).astype(np.float32)
    lat_lon = _grid(s1, s2)
    times = pd.date_range('2023-01-01', periods=t, freq='h')
    chunks = []
    for s_idx, (ss1, ss2) in enumerate(
            [(slice(0, 3), slice(None)), (slice(3, 6), slice(None))]):
        fp = str(tmp_path / f'chunk_000000_{s_idx:06d}.nc')
        OutputHandlerNC._write_output(
            data[ss1, ss2].copy(), ['u_100m'], lat_lon[ss1, ss2],
            times, fp)
        chunks.append(fp)
    out_file = str(tmp_path / 'collected.nc')
    CollectorNC.collect(chunks, out_file)
    dset = LoaderNC(out_file).data
    np.testing.assert_allclose(dset['u_100m'], data[..., 0], atol=1e-4)


def _curvi_grid(s1, s2):
    """A rotated (non-separable) lat/lon grid."""
    i, j = np.meshgrid(np.arange(s1), np.arange(s2), indexing='ij')
    lat = 40.0 - 0.1 * i - 0.02 * j
    lon = -105.0 + 0.1 * j + 0.02 * i
    return np.dstack([lat, lon]).astype(np.float32)


def test_collect_nc_curvilinear(tmp_path):
    """Latitude-split curvilinear chunks collect bit-exactly with
    is_regular_grid=False (reference nc.py:117-120), across 2 time x 3
    spatial chunks; the regular path refuses them loudly."""
    s1, s2, t = 9, 5, 6
    data = RANDOM_GENERATOR.random((s1, s2, t, 2)).astype(np.float32)
    lat_lon = _curvi_grid(s1, s2)
    times = pd.date_range('2023-01-01', periods=t, freq='h')
    feats = ['u_100m', 'v_100m']

    chunks = []
    for t_idx, ts in enumerate([slice(0, 3), slice(3, 6)]):
        for s_idx, ss in enumerate(
                [slice(0, 3), slice(3, 6), slice(6, 9)]):
            fp = str(tmp_path / f'chunk_{t_idx:06d}_{s_idx:06d}.nc')
            OutputHandlerNC._write_output(
                data[ss, :, ts].copy(), feats, lat_lon[ss],
                times[ts], fp)
            chunks.append(fp)

    with pytest.raises(NotImplementedError, match='is_regular_grid'):
        CollectorNC.collect(chunks, str(tmp_path / 'bad.nc'))

    out_file = str(tmp_path / 'collected.nc')
    CollectorNC.collect(chunks, out_file, is_regular_grid=False)
    dset = LoaderNC(out_file).data
    np.testing.assert_array_equal(dset.lat_lon, lat_lon)
    np.testing.assert_array_equal(
        dset.time_index.values, times.values)
    for k, f in enumerate(feats):
        np.testing.assert_array_equal(np.asarray(dset[f]),
                                      data[..., k])

    # a longitude-width mismatch is refused loudly (reference only
    # supports latitude splits, nc.py:39-45)
    bad = str(tmp_path / f'chunk_{0:06d}_{3:06d}.nc')
    OutputHandlerNC._write_output(
        data[:3, :4, :3].copy(), feats, lat_lon[:3, :4], times[:3],
        bad)
    with pytest.raises(NotImplementedError, match='west_east'):
        CollectorNC.collect([*chunks, bad],
                            str(tmp_path / 'bad2.nc'),
                            is_regular_grid=False)

    # a missing temporal chunk for one footprint is refused loudly
    with pytest.raises(ValueError, match='different time'):
        CollectorNC.collect(chunks[:-1], str(tmp_path / 'bad3.nc'),
                            is_regular_grid=False)


def test_collect_nc_curvilinear_lon_split_rejected(tmp_path):
    """An EQUAL-width longitude split passes the west_east-extent
    check but must still be refused loudly: stacking longitude-
    adjacent footprints along south_north garbles geography (the
    reference's xr.concat does so silently — nc.py:117-120; we
    promise NotImplementedError for non-latitude splits)."""
    s1, s2, t = 6, 8, 3
    data = RANDOM_GENERATOR.random((s1, s2, t, 1)).astype(np.float32)
    lat_lon = _curvi_grid(s1, s2)
    times = pd.date_range('2023-01-01', periods=t, freq='h')
    chunks = []
    for s_idx, ss2 in enumerate([slice(0, 4), slice(4, 8)]):
        fp = str(tmp_path / f'chunk_000000_{s_idx:06d}.nc')
        OutputHandlerNC._write_output(
            data[:, ss2].copy(), ['u_100m'], lat_lon[:, ss2], times,
            fp)
        chunks.append(fp)
    with pytest.raises(NotImplementedError, match='monotonic'):
        CollectorNC.collect(chunks, str(tmp_path / 'bad.nc'),
                            is_regular_grid=False)


def test_get_lat_lon_bilinear_matches_griddata():
    """The fast bilinear remesh agrees with the reference-style
    griddata remesh on regular and rotated grids."""
    import time

    # regular grid
    lr = _grid(6, 7)
    fast = OutputHandler.get_lat_lon(lr.copy(), (18, 21))
    slow = OutputHandler.get_lat_lon(lr.copy(), (18, 21),
                                     method='griddata')
    np.testing.assert_allclose(fast, slow, atol=1e-5)

    # mildly curvilinear grid
    i, j = np.meshgrid(np.arange(6), np.arange(7), indexing='ij')
    lat = 40 - 0.1 * i - 0.01 * j
    lon = -105 + 0.1 * j + 0.01 * i
    lr2 = np.dstack([lat, lon])
    fast2 = OutputHandler.get_lat_lon(lr2.copy(), (12, 14))
    slow2 = OutputHandler.get_lat_lon(lr2.copy(), (12, 14),
                                      method='griddata')
    np.testing.assert_allclose(fast2, slow2, atol=1e-5)

    # equivalence on a bigger grid too (speed is not asserted: this
    # test box has 1 noisy vCPU; see scripts/ benches for timings)
    big = _grid(30, 30)
    fast3 = OutputHandler.get_lat_lon(big.copy(), (120, 120))
    slow3 = OutputHandler.get_lat_lon(big.copy(), (120, 120),
                                      method='griddata')
    np.testing.assert_allclose(fast3, slow3, atol=1e-5)


def test_collect_h5_n_writes(tmp_path):
    """Multi-write collection equals single-pass collection."""
    s1, s2, t = 4, 4, 8
    data = (RANDOM_GENERATOR.random((s1, s2, t, 1)) * 10).astype(
        np.float32)
    lat_lon = _grid(s1, s2)
    times = pd.date_range('2023-01-01', periods=t, freq='h')
    gids = np.arange(s1 * s2).reshape(s1, s2)
    chunks = []
    for t_idx, t_slice in enumerate(
            [slice(0, 2), slice(2, 4), slice(4, 6), slice(6, 8)]):
        fp = str(tmp_path / f'chunk_{t_idx:06d}_000000.h5')
        OutputHandlerH5._write_output(
            data[:, :, t_slice].copy(), ['windspeed_100m'], lat_lon,
            times[t_slice], fp, gids=gids)
        chunks.append(fp)
    out1 = str(tmp_path / 'one.h5')
    out2 = str(tmp_path / 'multi.h5')
    CollectorH5.collect(chunks, out1)
    CollectorH5.collect(chunks, out2, n_writes=3)
    with h5py.File(out1, 'r') as f1, h5py.File(out2, 'r') as f2:
        np.testing.assert_array_equal(f1['windspeed_100m'][:],
                                      f2['windspeed_100m'][:])


def test_nc_writer_enforces_limits(tmp_path):
    """The NC writer caps physically bounded features on write even in
    its default raw-u/v mode — clearsky_ratio lands in [0, 1]
    (reference: tests/output/test_output_handling.py:240-259)."""
    import pandas as pd

    from sup3r_tpu.postprocessing.writers import OutputHandlerNC
    from sup3r_tpu.preprocessing.loaders import Loader

    data = np.random.default_rng(0).uniform(
        -100, 100, (10, 10, 10, 1)).astype(np.float32)
    lat, lon = np.meshgrid(np.linspace(40, 39, 10),
                           np.linspace(-105, -104, 10), indexing='ij')
    lat_lon = np.dstack([lat, lon])
    times = pd.date_range('2021-01-01', periods=10, freq='D')
    fp = str(tmp_path / 'out_csr.nc')
    OutputHandlerNC._write_output(data=data,
                                  features=['clearsky_ratio'],
                                  lat_lon=lat_lon, times=times,
                                  out_file=fp)
    arr = np.asarray(Loader(fp).data['clearsky_ratio'])
    assert float(arr.max()) <= 1.0
    assert float(arr.min()) >= 0.0


def test_get_lat_lon_arange_sizes():
    """Grid sizes where 10/n rounds down (61, 77, 122) used to make
    np.arange emit n+1 sample points and crash the remesh — the
    cell-position construction must be exact for every n."""
    for n in (61, 77, 122, 8):
        lats = np.linspace(40, 39, n)[:, None] * np.ones((1, 4))
        lons = np.linspace(-105, -104, 4)[None] * np.ones((n, 1))
        ll = np.dstack([lats, lons])
        out = OutputHandler.get_lat_lon(ll, (n * 2, 8))
        assert out.shape == (n * 2, 8, 2)
        assert np.isfinite(out).all()
        # interior HR lats stay within the LR extent
        assert out[..., 0].max() <= 40.51 and out[..., 0].min() >= 38.49


def test_collector_nc_empty_glob_is_loud(tmp_path):
    """A glob matching nothing raises a clear error instead of an
    IndexError deep in the combine (round-5 review finding; parity
    with CollectorH5's 'No chunk files to collect' assert)."""
    from sup3r_tpu.postprocessing.collectors import CollectorNC

    with pytest.raises(AssertionError, match='No chunk files'):
        CollectorNC.collect(str(tmp_path / 'nope_*.nc'),
                            str(tmp_path / 'out.nc'))
    with pytest.raises(AssertionError, match='No chunk files'):
        CollectorNC.collect([], str(tmp_path / 'out.nc'))
