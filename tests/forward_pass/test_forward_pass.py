"""Forward pass integration: strategy planning, chunked generation,
overlap stitching, incremental restart, output writing.

Mirrors reference tests/forward_pass/test_forward_pass.py:40-100.
"""

import os

import h5py
import numpy as np
import pytest

from sup3r_tpu.models import Sup3rGan
from sup3r_tpu.pipeline import ForwardPass, ForwardPassStrategy
from sup3r_tpu.utilities.test_helpers import (
    make_fake_h5_file,
    make_fake_nc_file,
)

FEATURES = ['u_100m', 'v_100m']


def _st_gen_config(n_feats=2, s_mult=3, t_mult=4):
    pad = {'class': 'FlexiblePadding',
           'paddings': [[0, 0], [3, 3], [3, 3], [3, 3], [0, 0]],
           'mode': 'REFLECT'}
    return [
        dict(pad),
        {'class': 'Conv3D', 'filters': 8, 'kernel_size': 3, 'strides': 1},
        {'class': 'Cropping3D', 'cropping': 2},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'SpatioTemporalExpansion', 'temporal_mult': t_mult,
         'temporal_method': 'nearest'},
        dict(pad),
        {'class': 'Conv3D', 'filters': 8 * s_mult * s_mult,
         'kernel_size': 3, 'strides': 1},
        {'class': 'Cropping3D', 'cropping': 2},
        {'class': 'SpatioTemporalExpansion', 'spatial_mult': s_mult},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        dict(pad),
        {'class': 'Conv3D', 'filters': n_feats, 'kernel_size': 3,
         'strides': 1},
        {'class': 'Cropping3D', 'cropping': 2},
    ]


def _s_gen_config(n_feats=2, mult=2):
    pad = {'class': 'FlexiblePadding',
           'paddings': [[0, 0], [3, 3], [3, 3], [0, 0]],
           'mode': 'REFLECT'}
    return [
        dict(pad),
        {'class': 'Conv2D', 'filters': 8 * mult * mult, 'kernel_size': 3,
         'strides': 1},
        {'class': 'Cropping2D', 'cropping': 2},
        {'class': 'SpatialExpansion', 'spatial_mult': mult},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        dict(pad),
        {'class': 'Conv2D', 'filters': n_feats, 'kernel_size': 3,
         'strides': 1},
        {'class': 'Cropping2D', 'cropping': 2},
    ]


def _save_model(tmp_path, gen_config, s_enhance, t_enhance, is_5d=True,
                features=FEATURES):
    disc = [{'class': 'Conv3D' if is_5d else 'Conv2D', 'filters': 8,
             'kernel_size': 3, 'strides': 2, 'padding': 'same'},
            {'class': 'LeakyReLU', 'alpha': 0.2},
            {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]
    model = Sup3rGan(gen_config, disc)
    model.meta.update(
        lr_features=features, hr_out_features=features,
        s_enhance=s_enhance, t_enhance=t_enhance,
        input_resolution={'spatial': '12km', 'temporal': '60min'})
    model.set_norm_stats({f: 0.0 for f in features},
                         {f: 1.0 for f in features})
    if is_5d:
        model.init_weights((1, 6, 6, 4, len(features)),
                           (1, 6 * s_enhance, 6 * s_enhance,
                            4 * t_enhance, len(features)))
    else:
        model.init_weights((1, 6, 6, len(features)),
                           (1, 6 * s_enhance, 6 * s_enhance,
                            len(features)))
    out_dir = os.path.join(tmp_path, 'model')
    model.save(out_dir)
    return out_dir, model


def _pointwise_gen_config(n_feats=2, s_mult=3, t_mult=4):
    """Receptive-field-1 generator (1x1 convs): chunked output must be
    EXACTLY equal to a full-domain run, isolating the slicer/stitch
    math from conv boundary effects."""
    return [
        {'class': 'Conv3D', 'filters': 8 * s_mult * s_mult,
         'kernel_size': 1, 'strides': 1},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'SpatioTemporalExpansion', 'temporal_mult': t_mult,
         'temporal_method': 'nearest'},
        {'class': 'SpatioTemporalExpansion', 'spatial_mult': s_mult},
        {'class': 'Conv3D', 'filters': n_feats, 'kernel_size': 1,
         'strides': 1},
    ]


def test_fwp_stitching_exact_pointwise(tmp_path):
    """With a receptive-field-1 generator, chunked == full exactly."""
    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'),
                                   (12, 12, 8), ['u100', 'v100'])
    model_dir, _ = _save_model(tmp_path, _pointwise_gen_config(), 3, 4)
    kwargs = dict(
        file_paths=input_file,
        model_kwargs={'model_dir': model_dir},
        fwp_chunk_shape=(5, 7, 3),
        spatial_pad=2, temporal_pad=2,
        out_pattern=None)
    strategy = ForwardPassStrategy(**kwargs)
    outputs = ForwardPass.run(strategy, 0)
    full = np.zeros((36, 36, 32, 2), dtype=np.float32)
    for idx, out in outputs.items():
        s_idx, t_idx = strategy.fwp_slicer.get_chunk_indices(idx)
        s_hr = strategy.fwp_slicer.s_hr_slices[s_idx]
        t_lr = strategy.fwp_slicer.t_lr_slices[t_idx]
        t_hr = slice(t_lr.start * 4, t_lr.stop * 4)
        full[s_hr[0], s_hr[1], t_hr] = out
    strategy_one = ForwardPassStrategy(**{
        **kwargs, 'fwp_chunk_shape': (12, 12, 8), 'spatial_pad': 0,
        'temporal_pad': 0})
    full_one = ForwardPass.run(strategy_one, 0)[0]
    np.testing.assert_allclose(full, full_one, atol=1e-5)


def test_fwp_nc_output_shape_and_stitching(tmp_path):
    """Chunked forward pass with a realistic reflect-pad conv generator
    produces the right full-domain shape (reference asserts shape, not
    chunk-vs-full equality: boundary reflect padding makes halo-padded
    chunks approximate)."""
    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'),
                                   (12, 12, 8), ['u100', 'v100'])
    model_dir, model = _save_model(tmp_path, _st_gen_config(), 3, 4)

    kwargs = dict(
        file_paths=input_file,
        model_kwargs={'model_dir': model_dir},
        input_handler_kwargs={},
        fwp_chunk_shape=(6, 6, 4),
        spatial_pad=2, temporal_pad=2,
        out_pattern=None)
    strategy = ForwardPassStrategy(**kwargs)
    assert strategy.fwp_slicer.n_chunks == 8
    outputs = ForwardPass.run(strategy, 0)
    assert len(outputs) == 8
    for idx, out in outputs.items():
        s_idx, t_idx = strategy.fwp_slicer.get_chunk_indices(idx)
        s_lr = strategy.fwp_slicer.s_lr_slices[s_idx]
        t_lr = strategy.fwp_slicer.t_lr_slices[t_idx]
        expect = ((s_lr[0].stop - s_lr[0].start) * 3,
                  (s_lr[1].stop - s_lr[1].start) * 3,
                  (t_lr.stop - t_lr.start) * 4, 2)
        assert out.shape == expect


def test_fwp_h5_output_files_and_incremental(tmp_path):
    """H5 in -> chunk H5 outputs with u/v -> ws/wd conversion; second
    run skips all finished chunks."""
    input_file = make_fake_h5_file(
        str(tmp_path / 'wtk.h5'), (12, 12, 8),
        ['windspeed_100m', 'winddirection_100m'])
    model_dir, _ = _save_model(tmp_path, _st_gen_config(), 3, 4)
    out_pattern = str(tmp_path / 'out' / 'fwp_out_{file_id}.h5')
    strategy = ForwardPassStrategy(
        file_paths=input_file,
        model_kwargs={'model_dir': model_dir},
        fwp_chunk_shape=(6, 6, 8),
        spatial_pad=1, temporal_pad=1,
        out_pattern=out_pattern)
    ForwardPass.run(strategy, 0)
    out_files = sorted(
        str(p) for p in (tmp_path / 'out').glob('*.h5'))
    assert len(out_files) == 4
    with h5py.File(out_files[0], 'r') as f:
        assert 'windspeed_100m' in f
        assert 'winddirection_100m' in f
        assert f['windspeed_100m'].shape == (32, 18 * 18)
        ws = f['windspeed_100m'][:] / f['windspeed_100m'].attrs[
            'scale_factor']
        assert ws.min() >= 0
        assert len(f['time_index']) == 32

    # incremental: all chunks finished -> run returns without redoing
    strategy2 = ForwardPassStrategy(
        file_paths=input_file,
        model_kwargs={'model_dir': model_dir},
        fwp_chunk_shape=(6, 6, 8),
        spatial_pad=1, temporal_pad=1,
        out_pattern=out_pattern)
    assert strategy2.node_finished(0)


def test_fwp_spatial_model(tmp_path):
    """4D spatial-only model: time steps become the batch dimension."""
    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'),
                                   (10, 10, 5), ['u100', 'v100'])
    model_dir, _ = _save_model(tmp_path, _s_gen_config(), 2, 1,
                               is_5d=False)
    strategy = ForwardPassStrategy(
        file_paths=input_file,
        model_kwargs={'model_dir': model_dir},
        fwp_chunk_shape=(5, 5, 5),
        spatial_pad=1, temporal_pad=0,
        out_pattern=None)
    outputs = ForwardPass.run(strategy, 0)
    assert outputs[0].shape == (10, 10, 5, 2)


def test_fwp_exo_topography(tmp_path):
    """Topography exo injection via Sup3rConcat mid-network layer."""
    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'),
                                   (10, 10, 4), ['u100', 'v100'])
    topo_file = make_fake_h5_file(
        str(tmp_path / 'topo.h5'), (30, 30, 2), ['windspeed_10m'],
        lat_range=(40.2, 38.8), lon_range=(-105.7, -104.1))
    gen = _s_gen_config()
    gen.insert(5, {'class': 'Sup3rConcat', 'name': 'topography'})
    model_dir, model = _save_model(tmp_path, gen, 2, 1, is_5d=False)
    strategy = ForwardPassStrategy(
        file_paths=input_file,
        model_kwargs={'model_dir': model_dir},
        fwp_chunk_shape=(10, 10, 4),
        spatial_pad=0, temporal_pad=0,
        exo_handler_kwargs={'topography': {
            'source_file': topo_file,
            'cache_dir': str(tmp_path / 'exo_cache')}},
        out_pattern=None)
    assert strategy.exo_data is not None
    steps = strategy.exo_data['topography']['steps']
    assert [s['combine_type'] for s in steps] == ['layer']
    outputs = ForwardPass.run(strategy, 0)
    assert outputs[0].shape == (20, 20, 4, 2)


def test_fwp_nan_input_raises(tmp_path):
    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'),
                                   (8, 8, 4), ['u100', 'v100'])
    model_dir, _ = _save_model(tmp_path, _st_gen_config(), 3, 4)
    strategy = ForwardPassStrategy(
        file_paths=input_file,
        model_kwargs={'model_dir': model_dir},
        fwp_chunk_shape=(8, 8, 4), spatial_pad=0, temporal_pad=0,
        out_pattern=None)
    fwp = ForwardPass(strategy, 0)
    chunk = fwp.get_input_chunk(0)
    chunk.input_data[0, 0, 0, 0] = np.nan
    with pytest.raises(RuntimeError, match='NaN'):
        fwp.run_chunk(chunk)


def test_output_check_constant():
    with pytest.raises(MemoryError, match='constant'):
        ForwardPass._output_check(np.zeros((4, 4, 4, 1)))
    # allowed when whitelisted
    ForwardPass._output_check(np.zeros((4, 4, 4, 1)),
                              allowed_const=[0.0])
    with pytest.raises(MemoryError, match='NaN'):
        ForwardPass._output_check(np.full((4, 4, 4, 1), np.nan))


def test_fwp_multi_node_split(tmp_path):
    """Chunks split across emulated nodes; union covers the domain
    exactly (reference runs ForwardPass.run(strategy, i) per node)."""
    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'),
                                   (12, 12, 8), ['u100', 'v100'])
    model_dir, _ = _save_model(tmp_path, _st_gen_config(), 3, 4)
    out_pattern = str(tmp_path / 'out' / 'chunk_{file_id}.h5')
    strategy = ForwardPassStrategy(
        file_paths=input_file,
        model_kwargs={'model_dir': model_dir},
        fwp_chunk_shape=(6, 6, 4), spatial_pad=1, temporal_pad=1,
        out_pattern=out_pattern, max_nodes=3)
    assert len(strategy.node_chunks) == 3
    all_ids = [i for chunk_ids in strategy.node_chunks
               for i in chunk_ids]
    assert sorted(all_ids) == list(range(8))
    for node in range(3):
        ForwardPass.run(strategy, node)
    out_files = sorted((tmp_path / 'out').glob('*.h5'))
    assert len(out_files) == 8


def test_fwp_spatial_mask_skips_chunks(tmp_path):
    """Chunks fully covered by a 'mask' variable are skipped."""
    import h5py as _h5

    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'),
                                   (12, 12, 4), ['u100', 'v100',
                                                 'mask'])
    # set mask=1 (masked) on the first 6 rows => top chunk row skipped
    # (fake nc files are NetCDF3; edit via scipy)
    from scipy.io import netcdf_file

    with netcdf_file(input_file, 'a', mmap=False) as f:
        arr = np.zeros(f.variables['mask'].shape, dtype=np.float32)
        arr[:, :6, :] = 1  # (time, lat, lon): lats descending -> rows
        f.variables['mask'][:] = arr
    model_dir, _ = _save_model(tmp_path, _st_gen_config(), 3, 4)
    strategy = ForwardPassStrategy(
        file_paths=input_file,
        model_kwargs={'model_dir': model_dir},
        fwp_chunk_shape=(6, 6, 4), spatial_pad=0, temporal_pad=0,
        out_pattern=None)
    # 4 spatial chunks; rows 0-5 masked => 2 of them skipped
    assert len(strategy.unmasked_chunks) == 2
    outputs = ForwardPass.run(strategy, 0)
    assert len(outputs) == 2


def test_fwp_invert_uv_option(tmp_path):
    """invert_uv=False keeps raw u/v in the H5 output; the default
    (None) inverts for H5 (reference: strategy.py invert_uv)."""
    import h5py

    input_file = make_fake_nc_file(str(tmp_path / 'in.nc'),
                                   (8, 8, 4), ['u100', 'v100'])
    model_dir, _ = _save_model(tmp_path, _s_gen_config(), 2, 1,
                               is_5d=False)

    def run(sub, **kw):
        pattern = str(tmp_path / sub / 'chunk_{file_id}.h5')
        strategy = ForwardPassStrategy(
            file_paths=input_file, model_class='Sup3rGan',
            model_kwargs={'model_dir': model_dir},
            fwp_chunk_shape=(8, 8, 4), spatial_pad=0, temporal_pad=0,
            out_pattern=pattern, **kw)
        ForwardPass.run(strategy, 0)
        return sorted((tmp_path / sub).glob('*.h5'))[0]

    fp_default = run('d')
    fp_raw = run('r', invert_uv=False)
    with h5py.File(fp_default, 'r') as f:
        assert 'windspeed_100m' in f and 'u_100m' not in f
    with h5py.File(fp_raw, 'r') as f:
        assert 'u_100m' in f and 'windspeed_100m' not in f
        # NEGATIVE u/v must round-trip (signed storage; the reference
        # declares uint16 for u/v, which would wrap)
        u = f['u_100m'][:] / f['u_100m'].attrs['scale_factor']
        assert f['u_100m'].dtype == np.int16
        assert u.min() < 50, 'suspicious wrap to large positives'
        assert abs(u).max() <= 120


def test_strategy_reference_compat_kwargs(tmp_path):
    """Reference-config strategy kwargs: min_width overrides the
    model-derived value and reaches the slicer; use_cpu is accepted
    (documented no-op); nn_fill defaults True like the reference
    (reference: strategy.py:109,177,201)."""
    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'),
                                   (12, 12, 8), ['u_100m', 'v_100m'])
    model_dir, _ = _save_model(tmp_path, _st_gen_config(), 3, 4)
    strategy = ForwardPassStrategy(
        file_paths=input_file,
        model_kwargs={'model_dir': model_dir},
        fwp_chunk_shape=(6, 6, 4),
        spatial_pad=1, temporal_pad=1,
        min_width=(5, 5, 3), use_cpu=True,
        out_pattern=None)
    assert strategy.fwp_slicer.min_width == (5, 5, 3)
    assert strategy.nn_fill is True
    outputs = ForwardPass.run(strategy, 0)
    assert outputs and all(o is not None for o in outputs.values())
