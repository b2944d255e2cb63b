"""Data-plane regressions from the round-4 self-review: multi-file
merges with static vars / disjoint var sets, negative-step H5 time
slices, the NCforCC pressure_* feature, tz-suffixed CF units, eager
handle cleanup, feature-filtered eager reads, exo cache source keying,
and 1-row raster_file round trips."""

import h5py
import numpy as np
import pytest

from sup3r_tpu.preprocessing.loaders import (
    LoaderH5,
    LoaderNC,
    decode_cf_time,
)
from sup3r_tpu.utilities.test_helpers import (
    make_fake_h5_file,
    make_fake_nc4_file,
)


def _add_static_var(fp, name='orog', value=7.0):
    with h5py.File(fp, 'a') as f:
        s1, s2 = f['lat'].size, f['lon'].size
        v = f.create_dataset(
            name, data=np.full((s1, s2), value, np.float32))
        v.dims[0].attach_scale(f['lat'])
        v.dims[1].attach_scale(f['lon'])
    return fp


def test_time_concat_keeps_static_vars(tmp_path):
    """A time-invariant variable (orography) present in EVERY monthly
    file must merge as one copy, not crash the time-concat on its
    missing time axis (round-4 review finding)."""
    a = _add_static_var(make_fake_nc4_file(
        str(tmp_path / 'jan.nc'), (5, 4, 8), ['u100'],
        start='2023-01-01'))
    b = _add_static_var(make_fake_nc4_file(
        str(tmp_path / 'feb.nc'), (5, 4, 8), ['u100'],
        start='2023-02-01'))
    loader = LoaderNC([a, b])
    assert loader.data['u_100m'].shape[-1] == 16  # (s1, s2, 16)
    np.testing.assert_array_equal(  # 'orog' standardizes
        np.asarray(loader.data['topography']), 7.0)
    assert len(loader.data.time_index) == 16


def test_disjoint_vars_mismatched_times_raise(tmp_path):
    """File A with u over January and file B with v over February
    share no variables — merging must fail loudly instead of silently
    stamping January's timestamps on February's data."""
    a = make_fake_nc4_file(str(tmp_path / 'u.nc'), (5, 4, 8),
                           ['u100'], start='2023-01-01')
    b = make_fake_nc4_file(str(tmp_path / 'v.nc'), (5, 4, 8),
                           ['v100'], start='2023-02-01')
    with pytest.raises(ValueError, match='misalign|missing from part'):
        LoaderNC([a, b])
    # same time range merges fine
    c = make_fake_nc4_file(str(tmp_path / 'v2.nc'), (5, 4, 8),
                           ['v100'], start='2023-01-01')
    loader = LoaderNC([a, c])
    assert set(loader.data.features) >= {'u_100m', 'v_100m'}


def test_h5_negative_step_time_slice(tmp_path):
    """Negative-step time slices over a multi-file H5 load return
    every row in slice order (the per-file descending slice dropped
    rows and kept file order — round-4 review finding)."""
    a = make_fake_h5_file(str(tmp_path / 'a.h5'), (3, 3, 10),
                          ['windspeed_100m'], start='2023-01-01')
    b = make_fake_h5_file(str(tmp_path / 'b.h5'), (3, 3, 10),
                          ['windspeed_100m'],
                          start='2023-01-01 10:00')
    loader = LoaderH5([a, b])
    var = loader._vars['windspeed_100m']
    fwd = var.get(slice(None))
    assert fwd.shape[0] == 20
    rev = var.get(slice(None, None, -1))
    np.testing.assert_array_equal(rev, fwd[::-1])
    rev2 = var.get(slice(17, 2, -3))
    np.testing.assert_array_equal(rev2, fwd[17:2:-3])


def test_ncforcc_pressure_feature(tmp_path):
    """RegistryNCforCC's pressure_(.*) -> level_(.*) resolves through
    the level coordinate: pressure at level X is X (reference
    methods.py:543; was dead code here — round-4 review finding)."""
    from sup3r_tpu.preprocessing.data_handlers import DataHandlerNCforCC

    nc = make_fake_nc4_file(str(tmp_path / 'gcm.nc'), (5, 4, 6),
                            ['ua'], levels=[100000.0, 85000.0],
                            start='2023-01-01', freq='D')
    dh = DataHandlerNCforCC(nc, features=['pressure_85000pa'])
    out = dh.data['pressure_85000pa']
    np.testing.assert_array_equal(out, np.float32(85000.0))
    assert out.shape == (5, 4, 6)


def test_cf_time_tz_suffix_is_naive():
    """CF units with a timezone suffix decode to a tz-NAIVE index so
    equals()/searchsorted interop with every other index."""
    for units in ('hours since 1990-01-01T00:00:00Z',
                  'hours since 1990-01-01 00:00:00+00:00'):
        ti = decode_cf_time(np.arange(4.0), units)
        assert ti.tz is None, units
        assert ti[0] == np.datetime64('1990-01-01T00:00:00')


def test_eager_load_closes_handles(tmp_path):
    """Eager NetCDF4 loads must close their h5py handles (lazy loads
    keep them, tracked for close())."""
    nc = make_fake_nc4_file(str(tmp_path / 'era.nc'), (4, 4, 5),
                            ['u100'])
    eager = LoaderNC(nc)
    assert eager._handles == []
    lazy = LoaderNC(nc, lazy=True)
    assert len(lazy._handles) == 1
    lazy.close()
    assert lazy._handles == []


def test_feature_filter_skips_unrequested_reads(tmp_path, monkeypatch):
    """An explicit features list must not pay RAM budget for (or read)
    the other variables in the file."""
    nc = make_fake_nc4_file(str(tmp_path / 'era.nc'), (16, 16, 64),
                            ['u100', 'v100', 'u10', 'v10'])
    # one var = 64 KiB; budget 100 KiB fits one but not four
    monkeypatch.setenv('SUP3R_TPU_HOST_RAM_GB',
                       str(100 / 1024 / 1024))
    loader = LoaderNC(nc, features=['u_100m'])
    assert list(loader.data.data_vars) == ['u_100m']
    with pytest.raises(MemoryError):
        LoaderNC(nc)  # all four still trips the budget


def test_exo_cache_keyed_by_source(tmp_path, monkeypatch):
    """Different exo source files (or source_handler_kwargs) on the
    same grid must not share a cache entry (round-4 review finding:
    silent stale rasters)."""
    from sup3r_tpu.preprocessing.exo import ExoRasterizer

    monkeypatch.setenv('SUP3R_TPU_EXO_CACHE_DIR',
                       str(tmp_path / 'exo'))
    input_file = make_fake_nc4_file(str(tmp_path / 'in.nc'),
                                    (8, 8, 4), ['u100', 'v100'])
    kwargs = dict(file_paths=input_file, feature='topography',
                  s_enhance=2, t_enhance=1)
    topo_a = make_fake_h5_file(
        str(tmp_path / 'topo_a.h5'), (30, 30, 2), ['windspeed_10m'],
        lat_range=(40.2, 38.8), lon_range=(-105.7, -104.1))
    topo_b = make_fake_h5_file(
        str(tmp_path / 'topo_b.h5'), (30, 30, 2), ['windspeed_10m'],
        lat_range=(40.2, 38.8), lon_range=(-105.7, -104.1))
    ra = ExoRasterizer(source_file=topo_a, **kwargs)
    rb = ExoRasterizer(source_file=topo_b, **kwargs)
    assert ra.cache_file != rb.cache_file
    rk = ExoRasterizer(source_file=topo_a,
                       source_handler_kwargs={'res_kwargs': {}},
                       **kwargs)
    assert rk.cache_file != ra.cache_file
    # the two sources have different elevations -> different rasters
    da, db = ra.data, rb.data
    assert da.shape == db.shape
    assert not np.allclose(da, db)


def test_raster_file_single_row_roundtrip(tmp_path):
    """A (1, N) flat-H5 gid raster must reload 2-D from raster_file
    (np.loadtxt collapses single rows to 1-D without ndmin=2)."""
    from sup3r_tpu.preprocessing.rasterizers import Rasterizer

    h5 = make_fake_h5_file(str(tmp_path / 'wtk.h5'), (6, 5, 4),
                           ['windspeed_100m'])
    rf = str(tmp_path / 'raster.txt')
    r1 = Rasterizer(h5, target=(39.0, -105.5), shape=(1, 5),
                    raster_file=rf)
    first = np.asarray(r1.data['windspeed_100m'])
    assert first.shape[:2] == (1, 5)
    r2 = Rasterizer(h5, raster_file=rf)  # reload path
    np.testing.assert_array_equal(
        np.asarray(r2.data['windspeed_100m']), first)


def test_compose_slice_matches_numpy_exactly():
    """compose_slice must agree with numpy chained slicing for EVERY
    start/stop/step combination — an empty negative-step composition
    used to come back as slice(-1, None, -1) and select data where
    numpy selects nothing (review finding)."""
    from sup3r_tpu.preprocessing.loaders import compose_slice

    rng = np.random.default_rng(0)
    for _ in range(3000):
        n = int(rng.integers(1, 14))
        def rand_slice():
            lo = None if rng.random() < 0.3 else int(
                rng.integers(-n - 3, n + 3))
            hi = None if rng.random() < 0.3 else int(
                rng.integers(-n - 3, n + 3))
            step = int(rng.integers(-3, 4)) or 1
            return slice(lo, hi, step)
        outer, inner = rand_slice(), rand_slice()
        base = np.arange(n)
        np.testing.assert_array_equal(
            base[compose_slice(outer, inner, n)], base[outer][inner],
            err_msg=f'n={n} outer={outer} inner={inner}')
    # the specific regression shapes
    assert np.arange(1)[compose_slice(slice(0, 0, 1),
                                      slice(0, 0, -1), 1)].size == 0
    assert np.arange(11)[compose_slice(slice(-12, -4, -2),
                                       slice(-13, 3, 2), 11)].size == 0


def test_flat_nc_loader_closes_handles_on_invalid_input(tmp_path):
    """A failing LoaderNCFlat constructor (mismatched site lists)
    must close every handle it already opened (review finding: leaked
    fds in long-lived CLI node processes)."""
    from sup3r_tpu.preprocessing.loaders import LoaderNCFlat
    from sup3r_tpu.utilities.test_helpers import make_fake_flat_nc_file

    f1 = make_fake_flat_nc_file(str(tmp_path / 'a.nc'), (4, 4, 3),
                                ['u_100m'])
    f2 = make_fake_flat_nc_file(str(tmp_path / 'b.nc'), (5, 5, 3),
                                ['u_100m'], start='2023-01-02')
    opened = []
    orig = h5py.File

    def tracking_open(*args, **kwargs):
        h = orig(*args, **kwargs)
        opened.append(h)
        return h

    import unittest.mock as mock
    with mock.patch('sup3r_tpu.preprocessing.loaders.h5py.File',
                    side_effect=tracking_open):
        with pytest.raises(ValueError, match='site list'):
            LoaderNCFlat([f1, f2])
    assert opened, 'expected the loader to open handles'
    assert all(not h.id.valid for h in opened), 'leaked open handles'


def test_site_static_reads_are_broadcast_views(tmp_path):
    """Site-static vars (elevation/topography) must come back as
    zero-stride broadcast views over the sliced time length — a
    np.repeat materialization is a many-GB allocation on a multi-year
    store just to read one static row (round-4 review finding)."""
    from sup3r_tpu.preprocessing.loaders import LoaderNCFlat
    from sup3r_tpu.utilities.test_helpers import make_fake_flat_nc_file

    fp = make_fake_flat_nc_file(str(tmp_path / 'flat.nc'), (4, 5, 24),
                                ['u_100m'], with_topography=True)
    ld = LoaderNCFlat(fp)
    try:
        arr = ld.get('topography')
        assert arr.shape == (24, 20)
        assert arr.strides[0] == 0, 'static rows must not be copied'
        np.testing.assert_array_equal(arr[0], arr[23])
        # sliced reads follow the sliced time length
        win = ld.get('topography', time_slice=slice(3, 9))
        assert win.shape == (6, 20)
        assert win.strides[0] == 0
    finally:
        ld.close()

    # same contract on the H5 sites loader (1-D site-static dataset)
    h5fp = make_fake_h5_file(str(tmp_path / 'obs.h5'), (4, 5, 24),
                             ['u_100m'])
    with h5py.File(h5fp, 'a') as f:
        f.create_dataset('srl', data=np.arange(20, dtype=np.float32))
    ldh = LoaderH5(h5fp)
    try:
        srl = ldh.get('srl')
        assert srl.shape == (24, 20)
        assert srl.strides[0] == 0
        np.testing.assert_array_equal(srl[5], np.arange(20))
    finally:
        ldh.close()


def test_add_offset_without_scale_factor(tmp_path):
    """CF packing applies EITHER attribute: add_offset with no
    scale_factor (scale defaults to 1) must still shift the values —
    it was silently dropped (round-4 review finding)."""
    from sup3r_tpu.preprocessing.loaders import LoaderNCFlat
    from sup3r_tpu.utilities.test_helpers import make_fake_flat_nc_file

    attrs = {'u_100m': {'add_offset': 100.0}}
    fp = make_fake_nc4_file(str(tmp_path / 'g.nc'), (4, 5, 3),
                            ['u_100m'], var_attrs=attrs)
    with h5py.File(fp, 'r') as f:
        raw = f['u_100m'][:]
    ld = LoaderNC(fp)
    got = np.asarray(ld.data['u_100m'])  # (s1, s2, t)
    np.testing.assert_allclose(
        got, np.moveaxis(raw, 0, -1) + 100.0, rtol=1e-6)

    ffp = make_fake_flat_nc_file(str(tmp_path / 'f.nc'), (4, 5, 3),
                                 ['u_100m'], var_attrs=attrs)
    with h5py.File(ffp, 'r') as f:
        fraw = f['u_100m'][:]
    fld = LoaderNCFlat(ffp)
    try:
        np.testing.assert_allclose(fld.get('u_100m'), fraw + 100.0,
                                   rtol=1e-6)
    finally:
        fld.close()
