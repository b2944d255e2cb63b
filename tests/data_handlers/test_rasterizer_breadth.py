"""Rasterizer extent/caching breadth (mirrors reference
tests/rasterizers/test_rasterizer_general.py, test_shapes.py,
test_rasterizer_caching.py): target/shape extraction matrices for NC
and H5, raster-index cache reuse, preloaded-loader input, and 5D
(pressure-level) extraction shapes."""

import os

import numpy as np
import pytest

from sup3r_tpu.preprocessing.loaders import LoaderH5, LoaderNC
from sup3r_tpu.preprocessing.rasterizers import Rasterizer
from sup3r_tpu.utilities.test_helpers import (
    make_fake_h5_file,
    make_fake_nc_file,
)


@pytest.mark.parametrize(('shape', 'target'), [
    ((4, 4), 'corner'),
    ((6, 8), 'corner'),
    ((10, 12), None),       # full domain
])
@pytest.mark.parametrize('ext', ['nc', 'h5'])
def test_extent_extraction_matrix(tmp_path, shape, target, ext):
    """Extracted windows carry the right grid shape and coordinates
    match the source (reference: test_rasterizer_general.py:65-84)."""
    feat = 'u_100m' if ext == 'nc' else 'windspeed_100m'
    if ext == 'nc':
        fp = make_fake_nc_file(str(tmp_path / 'd.nc'), (10, 12, 4),
                               ['u100'])
        full = LoaderNC(fp).data.lat_lon
    else:
        fp = make_fake_h5_file(str(tmp_path / 'd.h5'), (10, 12, 4),
                               [feat])
        full = Rasterizer(fp).lat_lon
    tgt = (None if target is None
           else (full[-1, 0, 0], full[-1, 0, 1]))  # bottom-left corner
    r = Rasterizer(fp, target=tgt, shape=None if target is None
                   else shape)
    expect = shape if target else (10, 12)
    assert r.grid_shape == expect
    assert r.data[feat].shape == (*expect, 4)
    if tgt is not None:
        np.testing.assert_allclose(r.lat_lon[-1, 0], tgt, atol=1e-4)
    # descending latitude rows preserved
    assert r.lat_lon[0, 0, 0] > r.lat_lon[-1, 0, 0]


def test_5d_level_extraction(tmp_path):
    """Pressure-level variables extract as (s1, s2, t, level)
    (reference: test_shapes.py:16-44)."""
    fp = make_fake_nc_file(str(tmp_path / 'lev.nc'), (8, 8, 3),
                           ['zg', 'u'], levels=[1000, 850, 700])
    r = Rasterizer(fp, target=None, shape=None)
    assert r.data['zg'].shape == (8, 8, 3, 3)
    r2 = Rasterizer(fp, target=(r.lat_lon[-1, 0, 0],
                                r.lat_lon[-1, 0, 1]), shape=(4, 5))
    assert r2.data['zg'].shape == (4, 5, 3, 3)
    np.testing.assert_array_equal(r2.data.levels, [1000, 850, 700])


def test_raster_index_cache_reuse(tmp_path):
    """raster_file writes the gid index once; a second rasterizer
    reuses it byte-identically and skips the coordinate search
    (reference: test_rasterizer_caching.py:17-50)."""
    fp = make_fake_h5_file(str(tmp_path / 'wtk.h5'), (10, 12, 4),
                           ['windspeed_100m'])
    rfile = str(tmp_path / 'raster.txt')
    full = Rasterizer(fp).lat_lon
    tgt = (full[-1, 0, 0], full[-1, 0, 1])
    r1 = Rasterizer(fp, target=tgt, shape=(5, 6), raster_file=rfile)
    assert os.path.exists(rfile)
    r2 = Rasterizer(fp, raster_file=rfile)
    np.testing.assert_array_equal(np.asarray(r2.raster_index),
                                  np.asarray(r1.raster_index))
    np.testing.assert_allclose(np.asarray(r2.data['windspeed_100m']),
                               np.asarray(r1.data['windspeed_100m']))


def test_preloaded_loader_input(tmp_path):
    """A preloaded Loader object can be passed instead of file paths
    (reference: test_rasterizer_general.py:85-100)."""
    fp = make_fake_h5_file(str(tmp_path / 'wtk.h5'), (8, 8, 4),
                           ['windspeed_100m'])
    loader = LoaderH5(fp)
    r = Rasterizer(loader=loader)
    assert r.data['windspeed_100m'].shape == (8, 8, 4)


def test_time_slice_applies(tmp_path):
    fp = make_fake_nc_file(str(tmp_path / 'd.nc'), (6, 6, 10),
                           ['u100'])
    r = Rasterizer(fp, time_slice=slice(2, 8, 2))
    assert r.data['u_100m'].shape == (6, 6, 3)
    assert len(r.data.time_index) == 3
