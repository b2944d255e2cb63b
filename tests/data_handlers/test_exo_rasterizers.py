"""Exo rasterizer breadth (mirrors reference
tests/rasterizers/test_exo.py:29-382): topo extraction values vs a
manual KDTree aggregation, cache round trips + extent keying, sza
values, obs NaN aggregation, and distance-bound behavior."""

import os

import numpy as np
import pytest

from sup3r_tpu.preprocessing.exo import (
    ExoRasterizer,
    ObsRasterizer,
    SzaRasterizer,
)
from sup3r_tpu.preprocessing.loaders import LoaderH5
from sup3r_tpu.utilities.test_helpers import (
    make_fake_h5_file,
    make_fake_nc_file,
)


@pytest.fixture
def files(tmp_path):
    lr_fp = make_fake_nc_file(str(tmp_path / 'lr.nc'), (8, 8, 4),
                              ['u100'])
    topo_fp = make_fake_h5_file(
        str(tmp_path / 'topo.h5'), (40, 40, 2), ['windspeed_10m'],
        lat_range=(40.2, 38.8), lon_range=(-105.7, -104.1))
    return lr_fp, topo_fp


@pytest.mark.parametrize('s_enhance', [1, 2, 3])
def test_topo_extraction_matches_manual_agg(files, tmp_path,
                                            s_enhance):
    """Raster values equal a manual nearest-HR-cell mean of the source
    elevations (reference: test_exo.py:219-273)."""
    from scipy.spatial import cKDTree

    lr_fp, topo_fp = files
    r = ExoRasterizer(file_paths=lr_fp, source_file=topo_fp,
                      feature='topography', s_enhance=s_enhance,
                      cache_dir=str(tmp_path / 'cache'))
    data = r.data
    assert data.shape == (8 * s_enhance, 8 * s_enhance, 1)

    loader = LoaderH5(topo_fp)
    coords = loader.lat_lon_flat
    elev = loader.elevation
    grid = r.hr_lat_lon.reshape(-1, 2)
    tree = cKDTree(grid)
    dist, idx = tree.query(
        coords, distance_upper_bound=r.get_distance_upper_bound())
    valid = np.isfinite(dist)
    for cell in np.unique(idx[valid])[:25]:
        expected = elev[valid][idx[valid] == cell].mean()
        np.testing.assert_allclose(
            data.reshape(-1)[cell], expected, rtol=1e-5)


def test_exo_cache_roundtrip_and_extent_keying(files, tmp_path):
    """Second construction loads the .npy cache; a different extent
    gets its own cache file (reference: test_exo.py:36-160)."""
    lr_fp, topo_fp = files
    cache = str(tmp_path / 'cache')
    r1 = ExoRasterizer(file_paths=lr_fp, source_file=topo_fp,
                       feature='topography', s_enhance=2,
                       cache_dir=cache)
    d1 = r1.data
    assert os.path.exists(r1.cache_file)
    r2 = ExoRasterizer(file_paths=lr_fp, source_file=topo_fp,
                       feature='topography', s_enhance=2,
                       cache_dir=cache)
    np.testing.assert_array_equal(r2.data, d1)

    lr2 = make_fake_nc_file(str(tmp_path / 'lr2.nc'), (8, 8, 4),
                            ['u100'], lat_range=(45.0, 44.0),
                            lon_range=(-100.5, -99.3))
    r3 = ExoRasterizer(file_paths=lr2, source_file=topo_fp,
                       feature='topography', s_enhance=2,
                       cache_dir=cache)
    assert r3.cache_file != r1.cache_file


def test_distance_upper_bound_no_match_raises(files, tmp_path):
    """A bound that excludes every source point fails loudly instead
    of producing an all-NaN raster (reference: test_exo.py:274-300
    warns on bad s_enhance; we error on the unusable config)."""
    lr_fp, topo_fp = files
    r = ExoRasterizer(file_paths=lr_fp, source_file=topo_fp,
                      feature='topography', s_enhance=2,
                      cache_dir=str(tmp_path / 'c1'),
                      distance_upper_bound=1e-9)
    with pytest.raises(RuntimeError, match='No "topography" source'):
        _ = r.data
    # a generous bound works and NN-fills any sparse cells
    r2 = ExoRasterizer(file_paths=lr_fp, source_file=topo_fp,
                       feature='topography', s_enhance=2,
                       cache_dir=str(tmp_path / 'c2'),
                       distance_upper_bound=0.05)
    assert np.isfinite(r2.data).all()


def test_sza_rasterizer_values(files, tmp_path):
    """SZA raster equals the analytic solar_zenith on the enhanced
    grid/time (reference: test_exo.py sza parity)."""
    from sup3r_tpu.ops.solar_pos import solar_zenith

    lr_fp, _ = files
    r = SzaRasterizer(file_paths=lr_fp, feature='sza', s_enhance=2,
                      t_enhance=2, cache_dir=str(tmp_path / 'c'))
    data = r.data
    assert data.shape == (16, 16, 8, 1)
    expected = solar_zenith(r.hr_time_index, r.hr_lat_lon)[..., None]
    np.testing.assert_allclose(data, expected, atol=1e-5)
    assert data.min() >= 0 and data.max() <= 180


def test_obs_rasterizer_keeps_nans(tmp_path):
    """Cells with no observation stay NaN (sparse rasters feed the
    WithObs training masks; reference: test_exo.py:342-382)."""
    lr_fp = make_fake_nc_file(str(tmp_path / 'lr.nc'), (8, 8, 4),
                              ['u100'])
    # sparse obs: a 3x3 station grid inside the domain
    obs_fp = make_fake_h5_file(
        str(tmp_path / 'obs.h5'), (3, 3, 2), ['u_100m'],
        lat_range=(39.9, 39.7), lon_range=(-105.3, -105.1))
    r = ObsRasterizer(file_paths=lr_fp, source_file=obs_fp,
                      feature='u_100m_obs', s_enhance=1,
                      cache_dir=str(tmp_path / 'c'))
    data = r.data[..., 0]
    assert np.isnan(data).any(), 'far cells must stay NaN'
    assert np.isfinite(data).any(), 'station cells must have values'
    # the finite cells sit where the stations are (nearest LR cells)
    finite_frac = np.isfinite(data).mean()
    assert finite_frac < 0.5


def test_obs_cache_keyed_by_time_extent(tmp_path):
    """Obs rasters are time-dependent: two runs over different time
    windows on the same domain must NOT share a cache file (topo
    rasters stay time-blind; round-3 review finding)."""
    import os

    obs_fp = make_fake_h5_file(
        str(tmp_path / 'obs.h5'), (3, 3, 8), ['u_100m'],
        lat_range=(39.9, 39.7), lon_range=(-105.3, -105.1))
    lr_a = make_fake_nc_file(str(tmp_path / 'lr_a.nc'), (8, 8, 4),
                             ['u100'], start='2023-01-01')
    lr_b = make_fake_nc_file(str(tmp_path / 'lr_b.nc'), (8, 8, 4),
                             ['u100'], start='2023-06-01')
    cache = str(tmp_path / 'c')
    r_a = ObsRasterizer(file_paths=lr_a, source_file=obs_fp,
                        feature='u_100m_obs', s_enhance=1,
                        cache_dir=cache)
    r_b = ObsRasterizer(file_paths=lr_b, source_file=obs_fp,
                        feature='u_100m_obs', s_enhance=1,
                        cache_dir=cache)
    assert r_a.cache_file != r_b.cache_file
    _ = r_a.data
    _ = r_b.data
    assert os.path.exists(r_a.cache_file)
    assert os.path.exists(r_b.cache_file)
    # identical windows DO share the cache
    r_a2 = ObsRasterizer(file_paths=lr_a, source_file=obs_fp,
                         feature='u_100m_obs', s_enhance=1,
                         cache_dir=cache)
    assert r_a2.cache_file == r_a.cache_file


def test_exo_scale_factor_and_fill_nans(tmp_path):
    """scale_factor calibrates raw source values (reference:
    rasterizers/exo.py:104-107); fill_nans=True NN-fills sparse obs
    rasters; scaled rasters get their own cache entry."""
    lr_fp = make_fake_nc_file(str(tmp_path / 'lr.nc'), (8, 8, 4),
                              ['u100'])
    obs_fp = make_fake_h5_file(
        str(tmp_path / 'obs.h5'), (3, 3, 2), ['u_100m'],
        lat_range=(39.9, 39.7), lon_range=(-105.3, -105.1))
    cache = str(tmp_path / 'c')
    r1 = ObsRasterizer(file_paths=lr_fp, source_file=obs_fp,
                       feature='u_100m_obs', s_enhance=1,
                       cache_dir=cache)
    r2 = ObsRasterizer(file_paths=lr_fp, source_file=obs_fp,
                       feature='u_100m_obs', s_enhance=1,
                       cache_dir=cache, scale_factor=2.0)
    assert r1.cache_file != r2.cache_file
    d1, d2 = r1.data, r2.data
    m = np.isfinite(d1)
    np.testing.assert_allclose(d2[m], 2.0 * d1[m], rtol=1e-6)
    assert np.isnan(d1).any()  # obs default keeps NaNs
    # fill_nans=True produces a dense raster
    r3 = ObsRasterizer(file_paths=lr_fp, source_file=obs_fp,
                       feature='u_100m_obs', s_enhance=1,
                       cache_dir=cache, fill_nans=True)
    assert r3.cache_file != r1.cache_file  # fill keyed separately
    assert np.isfinite(r3.data).all()
