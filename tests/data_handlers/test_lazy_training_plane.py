"""Streaming (lazy) TRAINING data plane: DataHandler(mode='lazy')
produces a LazyGridDataset whose sampled windows are bit-identical to
the eager path, stats stream without materializing, and the
SUP3R_TPU_HOST_RAM_GB budget pushes users to lazy mode.

Reference semantics: mode='lazy' defers compute to sample time
(sup3r/preprocessing/batch_queues/abstract.py:135-141,
samplers/base.py:228-243)."""

import numpy as np
import pytest

from sup3r_tpu.preprocessing import DataHandler, LazyGridDataset
from sup3r_tpu.utilities.test_helpers import (
    make_fake_h5_file,
    make_fake_nc4_file,
)


def _sample_indices(shape, sample_shape, n, rng):
    """Deterministic random window indices over a (s1, s2, t, f)."""
    out = []
    for _ in range(n):
        r = rng.integers(0, shape[0] - sample_shape[0] + 1)
        c = rng.integers(0, shape[1] - sample_shape[1] + 1)
        t = rng.integers(0, shape[2] - sample_shape[2] + 1)
        out.append((slice(r, r + sample_shape[0]),
                    slice(c, c + sample_shape[1]),
                    slice(t, t + sample_shape[2])))
    return out


def test_lazy_nc_sample_parity(tmp_path):
    """NC (h5py-backed) lazy handler: sampled windows (including a
    level-interpolated feature) match the eager handler bit-exactly."""
    sfc = make_fake_nc4_file(
        str(tmp_path / 'era_sfc.nc'), (12, 11, 30), ['u100', 'v100'],
        scale_factor=1e-4)
    make_fake_nc4_file(
        str(tmp_path / 'era_pl.nc'), (12, 11, 30), ['u'],
        levels=[1000.0, 900.0, 800.0], scale_factor=1e-4)
    path = [sfc, str(tmp_path / 'era_pl.nc')]
    feats = ['u_100m', 'v_100m', 'windspeed_100m', 'u_900pa']
    eager = DataHandler(path, features=feats)
    lazy = DataHandler(path, features=feats, mode='lazy')
    assert isinstance(lazy.data, LazyGridDataset)
    assert lazy.data.shape == eager.data.shape
    assert lazy.data.features == eager.data.features
    np.testing.assert_array_equal(lazy.lat_lon, eager.lat_lon)
    assert lazy.time_index.equals(eager.time_index)

    rng = np.random.default_rng(0)
    for s1, s2, t in _sample_indices(eager.data.shape, (5, 4, 6), 8,
                                     rng):
        idx = (s1, s2, t, feats)
        np.testing.assert_array_equal(
            lazy.data.sample(idx), eager.data.sample(idx))


def test_lazy_h5_sample_parity(tmp_path):
    """Flattened-H5 lazy handler: gid-window reads + window derivation
    (wind rotation with halo) match eager bit-exactly, including
    windows away from the top row (grid-angle halo) and topography."""
    path = make_fake_h5_file(
        str(tmp_path / 'wtk.h5'), (14, 13, 24),
        ['windspeed_100m', 'winddirection_100m'],
        value_range=(0, 300))
    feats = ['u_100m', 'v_100m', 'topography']
    eager = DataHandler(path, features=feats)
    lazy = DataHandler(path, features=feats, mode='lazy')
    assert lazy.data.shape == eager.data.shape

    rng = np.random.default_rng(1)
    indices = _sample_indices(eager.data.shape, (6, 5, 8), 8, rng)
    # force windows at the top and bottom edges too
    indices += [(slice(0, 6), slice(0, 5), slice(0, 8)),
                (slice(8, 14), slice(8, 13), slice(16, 24))]
    for s1, s2, t in indices:
        idx = (s1, s2, t, feats)
        np.testing.assert_array_equal(
            lazy.data.sample(idx), eager.data.sample(idx))


def test_lazy_time_slice_and_shift(tmp_path):
    """time_slice restriction + time_shift compose with lazy reads."""
    path = make_fake_nc4_file(str(tmp_path / 'a.nc'), (8, 8, 20),
                              ['u100'])
    eager = DataHandler(path, features=['u_100m'],
                        time_slice=slice(4, 16), time_shift=-30)
    lazy = DataHandler(path, features=['u_100m'],
                       time_slice=slice(4, 16), time_shift=-30,
                       mode='lazy')
    assert lazy.time_index.equals(eager.time_index)
    idx = (slice(1, 7), slice(2, 8), slice(3, 9), ['u_100m'])
    np.testing.assert_array_equal(lazy.data.sample(idx),
                                  eager.data.sample(idx))


def test_lazy_streaming_stats_and_normalize(tmp_path):
    """feature_nanstats streams to the same stats the eager arrays
    give, and normalize() makes sampled windows match the eager
    normalized block."""
    path = make_fake_h5_file(
        str(tmp_path / 'wtk.h5'), (10, 10, 50),
        ['windspeed_100m', 'winddirection_100m'], value_range=(0, 300))
    feats = ['u_100m', 'v_100m']
    eager = DataHandler(path, features=feats)
    lazy = DataHandler(path, features=feats, mode='lazy')
    # force several streaming blocks
    lazy.data._stats_block_elems = 10 * 10 * 7

    for f in feats:
        mean, var = lazy.data.feature_nanstats(f)
        assert np.isclose(mean, np.nanmean(eager.data[f]), rtol=1e-5)
        assert np.isclose(var, np.nanvar(eager.data[f]), rtol=1e-4)

    means = {f: float(np.nanmean(eager.data[f])) for f in feats}
    stds = {f: float(np.nanstd(eager.data[f])) for f in feats}
    eager.data.normalize(means, stds)
    lazy.data.normalize(means, stds)
    idx = (slice(2, 8), slice(3, 9), slice(10, 20), feats)
    np.testing.assert_array_equal(lazy.data.sample(idx),
                                  eager.data.sample(idx))


def test_ram_budget_guard(tmp_path, monkeypatch):
    """Eager loads above SUP3R_TPU_HOST_RAM_GB raise (pointing at
    mode='lazy'); the lazy handler sails through under the same
    budget. Covers the NC and H5 eager read paths."""
    nc = make_fake_nc4_file(str(tmp_path / 'a.nc'), (16, 16, 64),
                            ['u100', 'v100'])
    h5 = make_fake_h5_file(str(tmp_path / 'b.h5'), (16, 16, 64),
                           ['windspeed_100m', 'winddirection_100m'],
                           value_range=(0, 300))
    # 16*16*64*4B per var ≈ 65 kB — set the budget below that
    monkeypatch.setenv('SUP3R_TPU_HOST_RAM_GB', '0.00003')
    with pytest.raises(MemoryError, match="mode='lazy'"):
        DataHandler(nc, features=['u_100m'])
    with pytest.raises(MemoryError, match="mode='lazy'"):
        DataHandler(h5, features=['u_100m'])
    lazy_nc = DataHandler(nc, features=['u_100m'], mode='lazy')
    lazy_h5 = DataHandler(h5, features=['u_100m'], mode='lazy')
    s = lazy_nc.data.sample(
        (slice(0, 4), slice(0, 4), slice(0, 4), ['u_100m']))
    assert s.shape == (4, 4, 4, 1)
    s = lazy_h5.data.sample(
        (slice(4, 8), slice(4, 8), slice(8, 16), ['u_100m']))
    assert s.shape == (4, 4, 8, 1)


def test_ram_budget_accumulates_across_member_files(tmp_path,
                                                    monkeypatch):
    """The eager-load budget must count the SUM over member files —
    a per-file counter let an n-file load exceed the cap n-fold
    before the merge concatenated it (review finding)."""
    from sup3r_tpu.preprocessing.loaders import LoaderNC

    files = []
    for i in range(4):
        files.append(make_fake_nc4_file(
            str(tmp_path / f'm{i}.nc'), (16, 16, 32), ['u100'],
            start=f'2023-0{i + 1}-01'))
    # one file's variable is 16*16*32*4 = 32.8 kB — budget admits a
    # single file but NOT four
    monkeypatch.setenv('SUP3R_TPU_HOST_RAM_GB', '0.00006')
    LoaderNC(files[0])  # single file fits
    with pytest.raises(MemoryError, match="mode='lazy'"):
        LoaderNC(files)


def test_lazy_rejects_unsupported(tmp_path):
    """Full-domain remaps and non-local derivations fail loudly."""
    path = make_fake_nc4_file(str(tmp_path / 'a.nc'), (8, 8, 10),
                              ['u100'])
    with pytest.raises(NotImplementedError, match='time_roll'):
        DataHandler(path, features=['u_100m'], mode='lazy', time_roll=3)
    with pytest.raises(NotImplementedError, match='hr_spatial_coarsen'):
        DataHandler(path, features=['u_100m'], mode='lazy',
                    hr_spatial_coarsen=2)
    with pytest.raises(NotImplementedError, match='cache_kwargs'):
        DataHandler(path, features=['u_100m'], mode='lazy',
                    cache_kwargs={'cache_pattern': str(
                        tmp_path / 'c_{feature}.h5')})
    with pytest.raises(ValueError, match='eager.*lazy'):
        DataHandler(path, features=['u_100m'], mode='nope')
    # CC handlers support lazy since round 5 (tests/data_handlers/
    # test_lazy_cc.py); the non-local night-mask derivation is still
    # rejected for PLAIN handlers (the CC handlers swap in a
    # precomputed per-timestep mask table instead)
    solar = make_fake_h5_file(
        str(tmp_path / 'nsrdb.h5'), (8, 8, 48), ['ghi', 'clearsky_ghi'],
        freq='h', value_range=(0, 600))
    with pytest.raises(NotImplementedError, match='non-local'):
        DataHandler(solar, features=['clearsky_ratio'], mode='lazy')


def test_lazy_time_shift_time_dependent_parity(tmp_path):
    """Time-DEPENDENT derivations (sza) under time_shift: the eager
    path derives from raw file timestamps and shifts only the label
    index afterwards (derivers.py); lazy must match. Regression: lazy
    used to hand the deriver the SHIFTED index, moving sza by
    time_shift (max divergence ~5.8 degrees at -30 min)."""
    path = make_fake_nc4_file(str(tmp_path / 'a.nc'), (8, 8, 20),
                              ['u100'])
    feats = ['u_100m', 'sza']
    eager = DataHandler(path, features=feats, time_shift=-30)
    lazy = DataHandler(path, features=feats, time_shift=-30,
                       mode='lazy')
    assert lazy.time_index.equals(eager.time_index)
    idx = (slice(1, 7), slice(2, 8), slice(3, 19), feats)
    np.testing.assert_array_equal(lazy.data.sample(idx),
                                  eager.data.sample(idx))


def test_lazy_sample_numpy_semantics(tmp_path):
    """sample() matches GridDataset's plain-numpy indexing: integer
    indices squeeze their axis, slice steps are honored (strided s1
    derives on the contiguous span then strides — wind rotation is
    row-nonlocal), and negative s1 strides fail loudly."""
    path = make_fake_h5_file(
        str(tmp_path / 'wtk.h5'), (12, 10, 16),
        ['windspeed_100m', 'winddirection_100m'], value_range=(0, 300))
    feats = ['u_100m', 'v_100m']
    eager = DataHandler(path, features=feats)
    lazy = DataHandler(path, features=feats, mode='lazy')
    cases = [
        (slice(2, 8), slice(1, 7), slice(0, 8), 1),          # int f
        (slice(2, 8), slice(1, 7), slice(0, 8), 0),
        (3, slice(1, 7), slice(0, 8), feats),                # int s1
        (slice(2, 8), 4, slice(0, 8), feats),                # int s2
        (slice(2, 8), slice(1, 7), 5, feats),                # int t
        (slice(1, 11, 2), slice(0, 9, 3), slice(0, 16, 4),
         feats),                                             # strides
        (slice(2, 9, 3), slice(1, 7), slice(0, 8), 1),       # both
    ]
    for idx in cases:
        got = lazy.data.sample(idx)
        want = eager.data.sample(idx)
        assert got.shape == want.shape, idx
        np.testing.assert_array_equal(got, want, err_msg=str(idx))
    with pytest.raises(NotImplementedError, match='negative'):
        lazy.data.sample((slice(8, 2, -1), slice(1, 7), slice(0, 8),
                          feats))


def test_lazy_stats_large_offset_precision():
    """feature_nanstats keeps two-pass accuracy for large-mean/
    small-variance features (shifted accumulation): a raw one-pass
    E[x^2]-mean^2 loses ~15% of the variance at mean~1e5, std~0.01."""
    from sup3r_tpu.names import Dimension
    from sup3r_tpu.preprocessing.lazy import LazyGridDataset
    from sup3r_tpu.preprocessing.loaders import RawDataset

    import pandas as pd

    rng = np.random.default_rng(7)
    vals = (1e5 + 0.01 * rng.standard_normal((4, 4, 500))).astype(
        np.float32)
    lat_lon = np.dstack(np.meshgrid(
        np.linspace(40, 39, 4), np.linspace(-105, -104, 4),
        indexing='ij')).astype(np.float32)
    raw = RawDataset(
        {'u_100m': vals},
        {'u_100m': (Dimension.SOUTH_NORTH, Dimension.WEST_EAST,
                    Dimension.TIME)},
        lat_lon, time_index=pd.date_range('2023-01-01', periods=500,
                                          freq='h'))
    ds = LazyGridDataset(raw, ['u_100m'], stats_block_elems=800)
    mean, var = ds.feature_nanstats('u_100m')
    v64 = vals.astype(np.float64)
    np.testing.assert_allclose(mean, np.nanmean(v64), rtol=1e-9)
    np.testing.assert_allclose(var, np.nanvar(v64), rtol=1e-6)


def test_ram_budget_cumulative_nc(tmp_path, monkeypatch):
    """The NC eager budget counts the CUMULATIVE load: four variables
    each under the cap must still trip it together."""
    nc = make_fake_nc4_file(str(tmp_path / 'multi.nc'), (16, 16, 64),
                            ['u100', 'v100', 'u10', 'v10'])
    # one var = 16*16*64*4 B = 64 KiB; budget 200 KiB passes any one
    # variable but not all four
    monkeypatch.setenv('SUP3R_TPU_HOST_RAM_GB',
                       str(200 / 1024 / 1024))
    with pytest.raises(MemoryError, match="mode='lazy'"):
        DataHandler(nc, features=['u_100m', 'v_100m', 'u_10m',
                                  'v_10m'])
    lazy = DataHandler(nc, features=['u_100m', 'v_100m', 'u_10m',
                                     'v_10m'], mode='lazy')
    s = lazy.data.sample((slice(0, 4), slice(0, 4), slice(0, 4),
                          ['u_100m', 'v_10m']))
    assert s.shape == (4, 4, 4, 2)


def test_lazy_single_row_window_at_row0(tmp_path):
    """Height-1 s1 windows starting at row 0 derive wind u/v exactly:
    the lazy window must extend one halo row BELOW (the top-halo rule
    only helps start1 > 0), else _grid_angle sees a single row whose
    roll delta wraps onto itself (round-4 review finding)."""
    path = make_fake_h5_file(
        str(tmp_path / 'wtk.h5'), (8, 7, 20),
        ['windspeed_100m', 'winddirection_100m'], value_range=(0, 300))
    feats = ['u_100m', 'v_100m']
    eager = DataHandler(path, features=feats)
    lazy = DataHandler(path, features=feats, mode='lazy')
    for idx in [
            (slice(0, 1), slice(0, 7), slice(0, 5), feats),
            (0, slice(0, 7), slice(0, 5), feats),       # int row 0
            (slice(0, 1), slice(2, 5), slice(3, 9), feats),
            (slice(7, 8), slice(0, 7), slice(0, 5), feats),  # last row
            (7, slice(0, 7), slice(0, 5), feats),
    ]:
        np.testing.assert_array_equal(
            lazy.data.sample(idx), eager.data.sample(idx),
            err_msg=f'idx={idx}')


def test_lazy_mixed_advanced_indexing_parity(tmp_path):
    """Integer spatial index + integer-array feature index follows
    numpy's mixed basic/advanced rules exactly as the eager path does
    (broadcast axis moves to the front — round-4 review finding)."""
    nc = make_fake_nc4_file(str(tmp_path / 'era.nc'), (10, 9, 16),
                            ['u100', 'v100', 'u10'])
    feats = ['u_100m', 'v_100m', 'u_10m']
    eager = DataHandler(nc, features=feats)
    lazy = DataHandler(nc, features=feats, mode='lazy')
    cases = [
        (slice(2, 5), 3, slice(0, 5), [1, 0]),   # int + int-array
        (slice(2, 5), 3, slice(0, 5), np.array([2, 0])),
        (2, 3, slice(0, 5), [0, 1]),             # two ints + array
        (slice(2, 5), 3, slice(0, 5), 1),        # int feature
        (slice(2, 5), slice(1, 4), 5, slice(0, 2)),
        (slice(0, 8, 2), slice(1, 9, 3), slice(0, 16, 4), [0, 2]),
        (slice(2, 5), 3, slice(0, 5), [1, 1]),   # duplicate features
    ]
    for idx in cases:
        exp = eager.data.sample(idx)
        got = lazy.data.sample(idx)
        assert got.shape == exp.shape, f'idx={idx}'
        np.testing.assert_array_equal(got, exp, err_msg=f'idx={idx}')


def test_lazy_accepts_falsy_unsupported_kwargs(tmp_path):
    """cache_kwargs={} / time_roll=0 are no-ops and must not trip the
    lazy-mode unsupported-kwargs gate (round-4 review finding)."""
    nc = make_fake_nc4_file(str(tmp_path / 'era.nc'), (6, 6, 10),
                            ['u100'])
    dh = DataHandler(nc, features=['u_100m'], mode='lazy',
                     cache_kwargs={}, time_roll=0,
                     hr_spatial_coarsen=1)
    assert dh.data.sample(
        (slice(0, 3), slice(0, 3), slice(0, 4), ['u_100m'])
    ).shape == (3, 3, 4, 1)
    with pytest.raises(NotImplementedError, match='cache_kwargs'):
        DataHandler(nc, features=['u_100m'], mode='lazy',
                    cache_kwargs={'cache_pattern': 'x_{feature}.h5'})


def test_lazy_multifile_reorder_sample_parity(tmp_path):
    """Multi-file H5 members given OUT of chronological order: the
    loader reorders them (round-5 data-plane review), and lazy
    gid-window reads that CROSS the member-file boundary must match
    eager bit-exactly (the window time routing runs over the
    reordered handle list)."""
    feb = make_fake_h5_file(
        str(tmp_path / 'a_feb.h5'), (10, 9, 12),
        ['windspeed_100m', 'winddirection_100m'],
        start='2023-02-01', value_range=(0, 300))
    jan = make_fake_h5_file(
        str(tmp_path / 'b_jan.h5'), (10, 9, 12),
        ['windspeed_100m', 'winddirection_100m'],
        start='2023-01-01', value_range=(0, 300))
    feats = ['u_100m', 'v_100m']
    eager = DataHandler([feb, jan], features=feats)
    lazy = DataHandler([feb, jan], features=feats, mode='lazy')
    assert lazy.data.shape == eager.data.shape
    assert eager.time_index[0].month == 1
    # windows inside each member AND straddling the file boundary
    for t in (slice(0, 6), slice(9, 15), slice(18, 24)):
        idx = (slice(2, 8), slice(1, 7), t, feats)
        np.testing.assert_array_equal(
            lazy.data.sample(idx), eager.data.sample(idx))
