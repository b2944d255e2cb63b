"""Spatially-flattened (site-list) NetCDF support.

Mirrors reference ``test_load_flattened_nc``
(tests/loaders/test_file_loading.py:181; detection at
loaders/nc.py:73-80 ``_is_flattened``) and extends it: the flat-NC
loader exposes the same sites interface as the rex-H5 loader, so
raster reconstruction, DataHandler derivation, lazy sampling, and exo
sourcing all work on flattened NC — beyond the reference, whose
standard rasterizer rejects flattened input (rasterizers/base.py:2).
Also covers the generic (non-topography) exo feature extraction of
reference ``test_srl_extraction_h5`` (tests/rasterizers/
test_exo.py:163)."""

import numpy as np
import pandas as pd
import pytest

from sup3r_tpu.preprocessing.data_handlers import DataHandler
from sup3r_tpu.preprocessing.loaders import (
    Loader,
    LoaderNC,
    LoaderNCFlat,
    nc_is_flattened,
)
from sup3r_tpu.preprocessing.rasterizers import Rasterizer
from sup3r_tpu.utilities.test_helpers import (
    make_fake_flat_nc_file,
    make_fake_h5_file,
    make_fake_nc4_file,
)

SHAPE = (7, 6, 10)


def _paired_files(tmp_path, features=('u_100m', 'v_100m')):
    """One dataset written BOTH ways: gridded NC4 and flattened NC."""
    rng = np.random.default_rng(0)
    s1, s2, t = SHAPE
    data = {f: rng.random((t, s1, s2)).astype(np.float32)
            for f in features}
    flat_fp = make_fake_flat_nc_file(
        str(tmp_path / 'flat.nc'), SHAPE, list(features), data=data)
    grid_fp = str(tmp_path / 'grid.nc')
    import h5py
    with h5py.File(flat_fp, 'r') as src, h5py.File(grid_fp, 'w') as f:
        tv = f.create_dataset('time', data=src['time'][:])
        tv.attrs['units'] = src['time'].attrs['units']
        tv.make_scale('time')
        latv = f.create_dataset(
            'lat', data=src['latitude'][:].reshape(s1, s2)[:, 0])
        lonv = f.create_dataset(
            'lon', data=src['longitude'][:].reshape(s1, s2)[0])
        latv.make_scale('lat')
        lonv.make_scale('lon')
        for feat in features:
            ds = f.create_dataset(
                feat, data=data[feat])
            ds.dims[0].attach_scale(tv)
            ds.dims[1].attach_scale(latv)
            ds.dims[2].attach_scale(lonv)
    return flat_fp, grid_fp, data


def test_flat_detection_and_loader(tmp_path):
    """Detection + loader values/coords/time (reference
    test_load_flattened_nc semantics: shape = (sites, t, features))."""
    flat_fp, grid_fp, data = _paired_files(tmp_path)
    assert nc_is_flattened(flat_fp)
    assert not nc_is_flattened(grid_fp)

    ld = Loader(flat_fp)
    assert isinstance(ld, LoaderNCFlat)
    assert set(ld.features) == {'u_100m', 'v_100m'}
    s1, s2, t = SHAPE
    np.testing.assert_array_equal(
        ld.get('u_100m'), data['u_100m'].reshape(t, s1 * s2))
    assert ld.lat_lon_flat.shape == (s1 * s2, 2)
    assert len(ld.time_index) == t
    assert ld.time_index[0] == pd.Timestamp('2023-01-01')

    # gid-window + time-slice reads match the full read
    gids = np.array([3, 4, 9, 10])
    np.testing.assert_array_equal(
        ld.get('v_100m', slice(2, 7), gids),
        data['v_100m'].reshape(t, s1 * s2)[2:7][:, gids])
    ld.close()

    # constructing the gridded loader on a flat file fails loudly
    # instead of meshgridding a wrong n x n grid
    with pytest.raises(TypeError, match='flattened'):
        LoaderNC(flat_fp)


def test_flat_decode_space_first_and_multifile(tmp_path):
    """CF decode (K->C, scale/offset, fills), (points, time) axis
    order, and multi-file time concat with routed slices."""
    rng = np.random.default_rng(1)
    s1, s2, t = 4, 5, 6
    temp_k = (280 + 10 * rng.random((t, s1, s2))).astype(np.float32)
    f1 = make_fake_flat_nc_file(
        str(tmp_path / 'a.nc'), (s1, s2, t), ['temperature_100m'],
        data={'temperature_100m': temp_k}, space_first=True,
        var_attrs={'temperature_100m': {'units': np.bytes_('K')}})
    ld = Loader(f1)
    np.testing.assert_allclose(
        ld.get('temperature_100m'),
        temp_k.reshape(t, s1 * s2) - 273.15, atol=1e-4)
    ld.close()

    # two-file time concat: day 1 + day 2, one site list
    d1 = {'u_100m': rng.random((t, s1, s2)).astype(np.float32)}
    d2 = {'u_100m': rng.random((t, s1, s2)).astype(np.float32)}
    fa = make_fake_flat_nc_file(str(tmp_path / 'd1.nc'), (s1, s2, t),
                                ['u_100m'], data=d1,
                                start='2023-01-01')
    fb = make_fake_flat_nc_file(str(tmp_path / 'd2.nc'), (s1, s2, t),
                                ['u_100m'], data=d2,
                                start='2023-01-01 06:00')
    ld = Loader([fa, fb])
    assert isinstance(ld, LoaderNCFlat)
    assert len(ld.time_index) == 2 * t
    full = np.concatenate([d1['u_100m'], d2['u_100m']]).reshape(
        2 * t, s1 * s2)
    np.testing.assert_array_equal(ld.get('u_100m'), full)
    # a slice crossing the file boundary routes into each file
    np.testing.assert_array_equal(
        ld.get('u_100m', slice(4, 9), np.array([1, 7])),
        full[4:9][:, [1, 7]])
    ld.close()


def test_flat_rasterizer_and_datahandler_parity(tmp_path):
    """Raster reconstruction + derivation on flattened NC match the
    SAME data loaded from the gridded layout bit for bit."""
    flat_fp, grid_fp, _ = _paired_files(tmp_path)
    kwargs = {'features': ['windspeed_100m', 'winddirection_100m'],
              'target': (39.0, -105.5), 'shape': (5, 5)}
    dh_flat = DataHandler(flat_fp, **kwargs)
    dh_grid = DataHandler(grid_fp, **kwargs)
    np.testing.assert_array_equal(dh_flat.data.lat_lon,
                                  dh_grid.data.lat_lon)
    np.testing.assert_array_equal(dh_flat.data.data,
                                  dh_grid.data.data)

    # full-domain rasterization reconstructs the original grid
    r = Rasterizer(file_paths=flat_fp)
    assert r.grid_shape == SHAPE[:2]
    assert r.data['u_100m'].shape == (*SHAPE[:2], SHAPE[2])


def test_flat_lazy_mode_parity(tmp_path):
    """DataHandler(mode='lazy') streams sample windows from flattened
    NC with eager-identical values."""
    flat_fp, _, _ = _paired_files(tmp_path)
    kwargs = {'features': ['windspeed_100m'], 'target': (39.0, -105.5),
              'shape': (6, 6)}
    eager = DataHandler(flat_fp, **kwargs)
    lazy = DataHandler(flat_fp, mode='lazy', **kwargs)
    idx = (slice(1, 5), slice(2, 6), slice(3, 9), slice(None))
    np.testing.assert_array_equal(lazy.data.sample(idx),
                                  eager.data.data[idx])


def test_flat_static_topography_broadcasts(tmp_path):
    """Site-static variables (topography) must broadcast over the
    sliced time length so they stack against time-varying features —
    a 1-row result crashed the Deriver for any T>1 window (review
    finding on the initial flat-NC version)."""
    rng = np.random.default_rng(3)
    s1, s2, t = 6, 5, 8
    data = {'u_100m': rng.random((t, s1, s2)).astype(np.float32)}
    fp = make_fake_flat_nc_file(
        str(tmp_path / 'topo.nc'), (s1, s2, t), ['u_100m'], data=data,
        with_topography=True)
    ld = Loader(fp)
    assert ld.elevation is not None and ld.elevation.shape == (s1 * s2,)
    block = ld.get('topography', slice(2, 7))
    assert block.shape == (5, s1 * s2)
    np.testing.assert_array_equal(block[0], block[-1])
    ld.close()

    # eager AND lazy DataHandlers carry the static raster at full T
    dh = DataHandler(fp, features=['u_100m', 'topography'])
    assert dh.data.shape == (s1, s2, t, 2)
    topo = dh.data['topography']
    np.testing.assert_array_equal(topo[..., 0], topo[..., -1])
    lazy = DataHandler(fp, features=['u_100m', 'topography'],
                       mode='lazy')
    idx = (slice(1, 4), slice(0, 5), slice(2, 6), slice(None))
    np.testing.assert_array_equal(lazy.data.sample(idx),
                                  dh.data.data[idx])


def test_flat_multifile_name_order_vs_time_order(tmp_path):
    """Member files are concatenated CHRONOLOGICALLY even when their
    lexical filename order disagrees, and overlapping time ranges
    fail loudly (parity with LoaderNC._merge)."""
    rng = np.random.default_rng(4)
    s1, s2, t = 4, 4, 6
    jan = {'u_100m': rng.random((t, s1, s2)).astype(np.float32)}
    feb = {'u_100m': rng.random((t, s1, s2)).astype(np.float32)}
    # 'a_feb.nc' sorts before 'b_jan.nc' — chronology must win
    f_feb = make_fake_flat_nc_file(str(tmp_path / 'a_feb.nc'),
                                   (s1, s2, t), ['u_100m'], data=feb,
                                   start='2023-02-01')
    f_jan = make_fake_flat_nc_file(str(tmp_path / 'b_jan.nc'),
                                   (s1, s2, t), ['u_100m'], data=jan,
                                   start='2023-01-01')
    ld = Loader([f_feb, f_jan])
    assert ld.time_index.is_monotonic_increasing
    assert ld.time_index[0] == pd.Timestamp('2023-01-01')
    full = np.concatenate([jan['u_100m'], feb['u_100m']]).reshape(
        2 * t, s1 * s2)
    np.testing.assert_array_equal(ld.get('u_100m'), full)
    np.testing.assert_array_equal(
        ld.get('u_100m', slice(3, 9)), full[3:9])
    ld.close()

    # overlapping time ranges are an error, not silent duplication
    f_dup = make_fake_flat_nc_file(str(tmp_path / 'dup.nc'),
                                   (s1, s2, t), ['u_100m'], data=jan,
                                   start='2023-01-01')
    with pytest.raises(ValueError, match='overlap'):
        Loader([f_jan, f_dup])


def test_generic_exo_feature_extraction(tmp_path):
    """Arbitrary (non-topography) exo features aggregate from H5 AND
    flattened-NC sources (reference test_srl_extraction_h5,
    tests/rasterizers/test_exo.py:163)."""
    from scipy.spatial import cKDTree

    from sup3r_tpu.preprocessing.exo import ExoRasterizer

    lr_fp = make_fake_nc4_file(str(tmp_path / 'lr.nc'), (8, 8, 4),
                               ['u100'], lat_range=(40.0, 39.0),
                               lon_range=(-105.5, -104.3))
    src_h5 = make_fake_h5_file(
        str(tmp_path / 'srl.h5'), (40, 40, 2), ['srl'],
        lat_range=(40.2, 38.8), lon_range=(-105.7, -104.1),
        scale_factor=1000.0, value_range=(0, 1))
    for s_enhance in (1, 2):
        r = ExoRasterizer(file_paths=lr_fp, source_file=src_h5,
                          feature='srl', s_enhance=s_enhance,
                          cache_dir=str(tmp_path / 'cache'))
        data = r.data
        assert data.shape == (8 * s_enhance, 8 * s_enhance, 1)
        assert np.isfinite(data).all()
        # values equal a manual nearest-HR-cell mean of the source
        from sup3r_tpu.preprocessing.loaders import LoaderH5
        loader = LoaderH5(src_h5)
        vals = loader.get('srl')[0]
        grid = r.hr_lat_lon.reshape(-1, 2)
        dist, idx = cKDTree(grid).query(
            loader.lat_lon_flat,
            distance_upper_bound=r.get_distance_upper_bound())
        valid = np.isfinite(dist)
        for cell in np.unique(idx[valid])[:10]:
            np.testing.assert_allclose(
                data.reshape(-1)[cell],
                vals[valid][idx[valid] == cell].mean(), rtol=1e-4)
        loader.close()

    # flattened-NC exo source goes through the same sites branch
    rng = np.random.default_rng(2)
    src_nc = make_fake_flat_nc_file(
        str(tmp_path / 'srl_flat.nc'), (40, 40, 2), ['srl'],
        lat_range=(40.2, 38.8), lon_range=(-105.7, -104.1),
        data={'srl': rng.random((2, 40, 40)).astype(np.float32)})
    r = ExoRasterizer(file_paths=lr_fp, source_file=src_nc,
                      feature='srl', s_enhance=2,
                      cache_dir=str(tmp_path / 'cache2'))
    assert r.data.shape == (16, 16, 1)
    assert np.isfinite(r.data).all()


def test_obs_rasterizer_flat_nc_source(tmp_path):
    """ObsRasterizer with a spatially-flattened NC source must build
    the same spatiotemporal raster as the gridded-NC source carrying
    identical data (the flat branch was missing from
    _obs_source_series — Loader() returns LoaderNCFlat, which has no
    ``.data``; round-4 review finding)."""
    from sup3r_tpu.preprocessing.exo import ObsRasterizer
    from sup3r_tpu.utilities.test_helpers import make_fake_nc_file

    flat_fp, grid_fp, _ = _paired_files(tmp_path, features=('u_100m',))
    lr_fp = make_fake_nc_file(str(tmp_path / 'lr.nc'), (8, 8, 10),
                              ['u100'])
    kw = dict(file_paths=lr_fp, feature='u_100m_obs', s_enhance=1,
              t_enhance=1)
    r_flat = ObsRasterizer(source_file=flat_fp,
                           cache_dir=str(tmp_path / 'c1'), **kw)
    r_grid = ObsRasterizer(source_file=grid_fp,
                           cache_dir=str(tmp_path / 'c2'), **kw)
    assert np.isfinite(r_flat.data).any()
    np.testing.assert_array_equal(r_flat.data, r_grid.data)
