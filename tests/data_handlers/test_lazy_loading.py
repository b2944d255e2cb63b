"""Lazy (windowed) NetCDF4 reads + chunked streaming inference.

The reference gets input laziness from dask-backed xarray
(sup3r/preprocessing/loaders/nc.py, pipeline/strategy.py:253-266); here
it comes from _LazyNCVar h5py window reads + per-chunk windowed
DataHandlers (ForwardPassStrategy(chunked_io=True))."""

import numpy as np
import pytest

from sup3r_tpu.models import Sup3rGan
from sup3r_tpu.pipeline import ForwardPass, ForwardPassStrategy
from sup3r_tpu.preprocessing.loaders import (
    LoaderNC,
    _LazyNCVar,
    _LazyTimeConcat,
)
from sup3r_tpu.utilities.test_helpers import (
    make_fake_h5_file,
    make_fake_nc4_file,
)


def test_lazy_matches_eager_full(tmp_path):
    path = make_fake_nc4_file(str(tmp_path / 'a.nc'), (8, 7, 10),
                              ['u100', 'v100'], scale_factor=1e-4)
    eager = LoaderNC(path).data
    lazy = LoaderNC(path, lazy=True)
    var = lazy.data.data_vars['u_100m']
    assert isinstance(var, _LazyNCVar)
    np.testing.assert_allclose(np.asarray(var), eager['u_100m'],
                               rtol=1e-3, atol=1e-4)
    lazy.close()


@pytest.mark.parametrize('ascending', [False, True])
def test_lazy_window_reads(tmp_path, ascending):
    """isel windows read only the slice and match eager, including the
    descending-lat flip applied without materializing."""
    path = make_fake_nc4_file(str(tmp_path / 'a.nc'), (10, 9, 12),
                              ['u100'], ascending_lats=ascending)
    eager = LoaderNC(path).data
    lazy = LoaderNC(path, lazy=True)
    s1, s2, t = slice(2, 7), slice(1, 6), slice(3, 9)
    win = lazy.data.isel(s1=s1, s2=s2, t=t)
    np.testing.assert_allclose(win['u_100m'],
                               eager['u_100m'][s1, s2, t], rtol=1e-6)
    np.testing.assert_allclose(win.lat_lon, eager.lat_lon[s1, s2])
    # strided + reversed time slices go through the post-slice path
    var = lazy.data.data_vars['u_100m']
    for tsl in (slice(1, 11, 3), slice(10, 2, -2), slice(None, None, 2)):
        got = var.isel({'south_north': s1, 'west_east': s2, 'time': tsl})
        np.testing.assert_allclose(got, eager['u_100m'][s1, s2, tsl],
                                   rtol=1e-6)
    lazy.close()


def test_lazy_multifile_time_concat(tmp_path):
    """Sequential monthly-style files concat lazily; window reads only
    touch the overlapping files."""
    p1 = make_fake_nc4_file(str(tmp_path / 'a.nc'), (6, 5, 8), ['u100'],
                            start='2023-01-01')
    p2 = make_fake_nc4_file(str(tmp_path / 'b.nc'), (6, 5, 8), ['u100'],
                            start='2023-01-01 08:00')
    eager = LoaderNC([p1, p2]).data
    lazy = LoaderNC([p1, p2], lazy=True)
    var = lazy.data.data_vars['u_100m']
    assert isinstance(var, _LazyTimeConcat)
    assert var.shape[2] == 16
    # window spanning the file boundary
    win = lazy.data.isel(t=slice(5, 12))
    np.testing.assert_allclose(win['u_100m'], eager['u_100m'][:, :, 5:12],
                               rtol=1e-6)
    assert lazy.data.time_index.equals(eager.time_index)
    lazy.close()


def _small_gan(tmp_path):
    features = ['u_100m', 'v_100m']
    gen = [{'class': 'Conv2D', 'filters': 8, 'kernel_size': 3,
            'strides': 1, 'padding': 'same'},
           {'class': 'SpatialExpansion', 'spatial_mult': 2},
           {'class': 'Conv2D', 'filters': 2, 'kernel_size': 3,
            'strides': 1, 'padding': 'same'}]
    disc = [{'class': 'Conv2D', 'filters': 4, 'kernel_size': 3,
             'strides': 2, 'padding': 'same'},
            {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]
    model = Sup3rGan(gen, disc)
    model.meta.update(lr_features=features, hr_out_features=features,
                      s_enhance=2, t_enhance=1,
                      input_resolution={'spatial': '12km',
                                        'temporal': '60min'})
    model.set_norm_stats({f: 0.1 for f in features},
                         {f: 0.9 for f in features})
    model.init_weights((1, 5, 5, 2), (1, 10, 10, 2))
    d = str(tmp_path / 'model')
    model.save(d)
    return d


def test_chunked_io_fwp_matches_eager_nc(tmp_path):
    """chunked_io=True streams per-chunk windows and produces output
    identical to the eager full-domain path."""
    input_file = make_fake_nc4_file(str(tmp_path / 'in.nc'), (12, 12, 6),
                                    ['u100', 'v100'])
    model_dir = _small_gan(tmp_path)
    kwargs = dict(file_paths=input_file,
                  model_kwargs={'model_dir': model_dir},
                  fwp_chunk_shape=(6, 6, 3), spatial_pad=1,
                  temporal_pad=1, out_pattern=None)
    eager = ForwardPassStrategy(**kwargs)
    lazy = ForwardPassStrategy(chunked_io=True, **kwargs)
    assert eager.fwp_slicer.n_chunks == lazy.fwp_slicer.n_chunks
    for idx in range(eager.fwp_slicer.n_chunks):
        a, _ = eager.prep_chunk_data(idx)
        b, _ = lazy.prep_chunk_data(idx)
        np.testing.assert_allclose(a, b, rtol=1e-6)
    out_e = ForwardPass.run(eager, 0)
    out_l = ForwardPass.run(lazy, 0)
    for a, b in zip(out_e, out_l):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_chunked_io_fwp_flat_h5(tmp_path):
    """chunked_io with flattened-H5 input: per-chunk gid window reads
    reuse the meta raster index (no per-chunk grid walk)."""
    input_file = make_fake_h5_file(str(tmp_path / 'in.h5'), (10, 10, 4),
                                   ['u_100m', 'v_100m'])
    model_dir = _small_gan(tmp_path)
    kwargs = dict(file_paths=input_file,
                  model_kwargs={'model_dir': model_dir},
                  fwp_chunk_shape=(5, 5, 4), spatial_pad=1,
                  temporal_pad=0, out_pattern=None)
    eager = ForwardPassStrategy(**kwargs)
    lazy = ForwardPassStrategy(chunked_io=True, **kwargs)
    for idx in range(eager.fwp_slicer.n_chunks):
        a, _ = eager.prep_chunk_data(idx)
        b, _ = lazy.prep_chunk_data(idx)
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_chunked_io_rejects_grid_remaps(tmp_path):
    input_file = make_fake_nc4_file(str(tmp_path / 'in.nc'), (8, 8, 4),
                                    ['u100', 'v100'])
    model_dir = _small_gan(tmp_path)
    with pytest.raises(AssertionError, match='chunked_io'):
        ForwardPassStrategy(
            file_paths=input_file,
            model_kwargs={'model_dir': model_dir},
            fwp_chunk_shape=(8, 8, 4), out_pattern=None,
            input_handler_kwargs={'hr_spatial_coarsen': 2},
            chunked_io=True)


def test_chunked_io_with_nc_for_cc(tmp_path):
    """chunked_io composes with the GCM handler (per-chunk NSRDB
    clearsky regrid on the window) and matches the eager path."""
    from sup3r_tpu.utilities.test_helpers import make_fake_nc_file

    gcm = make_fake_nc_file(str(tmp_path / 'rsds.nc'), (8, 8, 4),
                            ['rsds'], freq='D')
    nsrdb = make_fake_h5_file(
        str(tmp_path / 'nsrdb.h5'), (10, 10, 48), ['clearsky_ghi'],
        freq='30min', value_range=(0, 1000),
        lat_range=(40.2, 38.9), lon_range=(-105.7, -104.2))

    features = ['clearsky_ratio']
    gen = [{'class': 'Conv2D', 'filters': 4, 'kernel_size': 3,
            'strides': 1, 'padding': 'same'},
           {'class': 'SpatialExpansion', 'spatial_mult': 2},
           {'class': 'Conv2D', 'filters': 1, 'kernel_size': 3,
            'strides': 1, 'padding': 'same'}]
    disc = [{'class': 'Conv2D', 'filters': 4, 'kernel_size': 3,
             'strides': 2, 'padding': 'same'},
            {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]
    from sup3r_tpu.models import Sup3rGan

    model = Sup3rGan(gen, disc)
    model.meta.update(lr_features=features, hr_out_features=features,
                      s_enhance=2, t_enhance=1,
                      input_resolution={'spatial': '100km',
                                        'temporal': '1440min'})
    model.set_norm_stats({f: 0.5 for f in features},
                         {f: 0.2 for f in features})
    model.init_weights((1, 4, 4, 1), (1, 8, 8, 1))
    model_dir = str(tmp_path / 'model')
    model.save(model_dir)

    kwargs = dict(
        file_paths=gcm, model_kwargs={'model_dir': model_dir},
        input_handler_name='DataHandlerNCforCC',
        input_handler_kwargs={'nsrdb_source_fp': nsrdb,
                              'nsrdb_agg': 2},
        fwp_chunk_shape=(4, 4, 4), spatial_pad=1, temporal_pad=0,
        out_pattern=None)
    eager = ForwardPassStrategy(**kwargs)
    lazy = ForwardPassStrategy(chunked_io=True, **kwargs)
    for idx in range(eager.fwp_slicer.n_chunks):
        a, _ = eager.prep_chunk_data(idx)
        b, _ = lazy.prep_chunk_data(idx)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_chunked_io_fwp_flat_nc(tmp_path):
    """chunked_io with spatially-FLATTENED NetCDF input: the meta
    raster is a gid array (flat path), so per-chunk reads window by
    gids exactly like flattened H5 — and match the eager full-domain
    strategy bit for bit."""
    from sup3r_tpu.utilities.test_helpers import make_fake_flat_nc_file

    input_file = make_fake_flat_nc_file(
        str(tmp_path / 'in_flat.nc'), (10, 10, 4),
        ['u_100m', 'v_100m'])
    model_dir = _small_gan(tmp_path)
    kwargs = dict(file_paths=input_file,
                  model_kwargs={'model_dir': model_dir},
                  fwp_chunk_shape=(5, 5, 4), spatial_pad=1,
                  temporal_pad=0, out_pattern=None)
    eager = ForwardPassStrategy(**kwargs)
    lazy = ForwardPassStrategy(chunked_io=True, **kwargs)
    assert isinstance(lazy._meta_rast.raster_index, np.ndarray)
    for idx in range(eager.fwp_slicer.n_chunks):
        a, _ = eager.prep_chunk_data(idx)
        b, _ = lazy.prep_chunk_data(idx)
        np.testing.assert_array_equal(a, b)
    out_e = ForwardPass.run(eager, 0)
    out_l = ForwardPass.run(lazy, 0)
    for a, b in zip(out_e, out_l):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_chunked_io_fwp_multifile_reordered_h5(tmp_path):
    """chunked_io with MULTI-FILE H5 input given out of chronological
    order: the loader reorders members (round-5 review) and per-chunk
    gid-window reads that cross the member boundary must equal the
    eager full-domain path."""
    feb = make_fake_h5_file(str(tmp_path / 'a_feb.h5'), (10, 10, 4),
                            ['u_100m', 'v_100m'], start='2023-02-01')
    jan = make_fake_h5_file(str(tmp_path / 'b_jan.h5'), (10, 10, 4),
                            ['u_100m', 'v_100m'], start='2023-01-01')
    model_dir = _small_gan(tmp_path)
    kwargs = dict(file_paths=[feb, jan],
                  model_kwargs={'model_dir': model_dir},
                  fwp_chunk_shape=(5, 5, 6), spatial_pad=1,
                  temporal_pad=1, out_pattern=None)
    eager = ForwardPassStrategy(**kwargs)
    lazy = ForwardPassStrategy(chunked_io=True, **kwargs)
    assert eager.input_handler.time_index[0].month == 1
    for idx in range(eager.fwp_slicer.n_chunks):
        a, _ = eager.prep_chunk_data(idx)
        b, _ = lazy.prep_chunk_data(idx)
        np.testing.assert_allclose(a, b, rtol=1e-6)
