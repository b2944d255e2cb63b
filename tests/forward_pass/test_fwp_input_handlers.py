"""Forward passes driven by composite input handlers (mirrors
reference tests/forward_pass/test_forward_pass.py:40-300):
DataHandlerNCforCC inputs (GCM + NSRDB clearsky regrid) and
input-cache write/reload through the strategy."""

import numpy as np
import pytest

from sup3r_tpu.models import Sup3rGan
from sup3r_tpu.pipeline import ForwardPass, ForwardPassStrategy
from sup3r_tpu.utilities.test_helpers import make_fake_nc_file
from tests.solar_qa.test_solar_qa import _make_fake_nsrdb


def _csr_model(tmp_path):
    gen = [
        {'class': 'Conv3D', 'filters': 8, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
        {'class': 'SpatioTemporalExpansion', 'spatial_mult': 2},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'Conv3D', 'filters': 1, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
    ]
    disc = [{'class': 'Conv3D', 'filters': 4, 'kernel_size': 3,
             'strides': 2, 'padding': 'same'},
            {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]
    model = Sup3rGan(gen, disc)
    model.meta.update(
        lr_features=['clearsky_ratio'],
        hr_out_features=['clearsky_ratio'],
        s_enhance=2, t_enhance=1,
        input_resolution={'spatial': '100km', 'temporal': '1440min'})
    model.set_norm_stats({'clearsky_ratio': 0.5},
                         {'clearsky_ratio': 0.2})
    model.init_weights((1, 4, 4, 2, 1), (1, 8, 8, 2, 1))
    d = str(tmp_path / 'csr_model')
    model.save(d)
    return d


def test_fwp_nc_cc_input_handler(tmp_path):
    """The sup3rcc production input path: GCM rsds + NSRDB clearsky
    regrid inside the strategy via input_handler_name
    ='DataHandlerNCforCC' (reference: test_forward_pass.py:40-96)."""
    gcm_fp = make_fake_nc_file(str(tmp_path / 'gcm.nc'), (8, 8, 4),
                               ['rsds'], freq='D')
    nsrdb_fp = _make_fake_nsrdb(str(tmp_path / 'nsrdb.h5'),
                                (12, 12, 96), start='2023-01-01')
    mdir = _csr_model(tmp_path)
    strategy = ForwardPassStrategy(
        file_paths=gcm_fp, model_class='Sup3rGan',
        model_kwargs={'model_dir': mdir},
        input_handler_name='DataHandlerNCforCC',
        input_handler_kwargs={'nsrdb_source_fp': nsrdb_fp},
        fwp_chunk_shape=(8, 8, 4), spatial_pad=0, temporal_pad=0,
        out_pattern=None)
    assert 'clearsky_ratio' in strategy.input_handler.data.features
    out = ForwardPass.run(strategy, 0)
    arr = next(iter(out.values()))
    assert arr.shape == (16, 16, 4, 1)
    assert np.isfinite(arr).all()


def test_fwp_input_cache_reload(tmp_path):
    """cache_kwargs in input_handler_kwargs: the first strategy writes
    the derived-input cache, the second reloads it (no rasterize pass)
    and produces identical outputs (reference:
    test_forward_pass.py:253-300)."""
    gcm_fp = make_fake_nc_file(str(tmp_path / 'gcm.nc'), (8, 8, 4),
                               ['rsds'], freq='D')
    nsrdb_fp = _make_fake_nsrdb(str(tmp_path / 'nsrdb.h5'),
                                (12, 12, 96), start='2023-01-01')
    mdir = _csr_model(tmp_path)
    cache_pattern = str(tmp_path / 'cache_{feature}.h5')
    kwargs = dict(
        file_paths=gcm_fp, model_class='Sup3rGan',
        model_kwargs={'model_dir': mdir},
        input_handler_name='DataHandlerNCforCC',
        input_handler_kwargs={
            'nsrdb_source_fp': nsrdb_fp,
            'cache_kwargs': {'cache_pattern': cache_pattern}},
        fwp_chunk_shape=(8, 8, 4), spatial_pad=0, temporal_pad=0,
        out_pattern=None)
    s1 = ForwardPassStrategy(**kwargs)
    out1 = next(iter(ForwardPass.run(s1, 0).values()))
    import os

    assert os.path.exists(
        cache_pattern.format(feature='clearsky_ratio'))
    s2 = ForwardPassStrategy(**kwargs)
    assert s2.input_handler.rasterizer is None  # cache hit
    out2 = next(iter(ForwardPass.run(s2, 0).values()))
    np.testing.assert_allclose(out2, out1, rtol=1e-5, atol=1e-5)


def test_cli_chunked_nc_cc_ships_clearsky_scale(tmp_path):
    """CLI forward-pass with chunked_io x NCforCC: the head node
    computes the domain clearsky scale once and ships it to workers
    through the node config (caught in review — every worker redid
    the full NSRDB scan)."""
    import json
    import glob

    from click.testing import CliRunner

    from sup3r_tpu.cli import main

    gcm_fp = make_fake_nc_file(str(tmp_path / 'gcm.nc'), (8, 8, 4),
                               ['rsds'], freq='D')
    nsrdb_fp = _make_fake_nsrdb(str(tmp_path / 'nsrdb.h5'),
                                (12, 12, 96), start='2023-01-01')
    mdir = _csr_model(tmp_path)
    out_pattern = str(tmp_path / 'out' / 'chunk_{file_id}.h5')
    cfg = {
        'file_paths': gcm_fp,
        'model_kwargs': {'model_dir': mdir},
        'model_class': 'Sup3rGan',
        'input_handler_name': 'DataHandlerNCforCC',
        'input_handler_kwargs': {'nsrdb_source_fp': nsrdb_fp},
        'fwp_chunk_shape': [8, 8, 4],
        'spatial_pad': 0, 'temporal_pad': 0,
        'chunked_io': True,
        'out_pattern': out_pattern,
        'execution_control': {'option': 'local'},
    }
    fp = str(tmp_path / 'config_fwp.json')
    with open(fp, 'w') as f:
        json.dump(cfg, f)
    runner = CliRunner()
    result = runner.invoke(main, ['-c', fp, 'forward-pass'], obj={})
    assert result.exit_code == 0, result.output
    assert list((tmp_path / 'out').glob('*.h5'))
    node_cfgs = glob.glob(str(tmp_path / '.forward-pass*node0.json'))
    assert node_cfgs
    node_cfg = json.load(open(node_cfgs[0]))
    scale = node_cfg['input_handler_kwargs'].get('clearsky_scale')
    # per-pixel raster ships as an .npy side file (JSON node config)
    assert isinstance(scale, str) and scale.endswith('.npy')
    raster = np.load(scale)
    assert raster.shape == (8, 8) and (raster > 0).all()


def test_time_slice_windowed_load_matches_full(tmp_path):
    """Eager mode with a narrow time_slice loads ONLY the padded
    window (round-3 review finding: it loaded the whole file) and
    produces outputs identical to the full-time run restricted to
    that window."""
    from tests.forward_pass.test_forward_pass import (
        _st_gen_config,
        _save_model,
    )

    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'),
                                   (8, 8, 16), ['u100', 'v100'])
    model_dir, _ = _save_model(tmp_path, _st_gen_config(), 3, 4)
    common = dict(
        file_paths=input_file,
        model_kwargs={'model_dir': model_dir},
        fwp_chunk_shape=(8, 8, 4), spatial_pad=0, temporal_pad=1,
        out_pattern=None)
    s_win = ForwardPassStrategy(
        **common,
        input_handler_kwargs={'time_slice': slice(4, 12)})
    # the handler holds only the padded window, not all 16 steps
    assert len(s_win.input_handler.time_index) == 10  # 8 + 2*pad
    out_win = ForwardPass.run(s_win, 0)

    s_full = ForwardPassStrategy(**common)
    out_full = ForwardPass.run(s_full, 0)
    # window chunks are full-run temporal chunks 1 and 2
    win_chunks = sorted(out_win)
    assert len(win_chunks) == 2
    np.testing.assert_allclose(out_win[win_chunks[0]], out_full[1],
                               rtol=1e-5)
    np.testing.assert_allclose(out_win[win_chunks[1]], out_full[2],
                               rtol=1e-5)


def test_time_slice_exo_alignment(tmp_path):
    """Time-varying exo (sza) stays aligned under a non-default
    time_slice (round-3 review finding: rasters were built on the
    shortened window but sliced with raw file coordinates)."""
    from sup3r_tpu.models import Sup3rGan

    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'),
                                   (8, 8, 12), ['u100', 'v100'])
    gen = [
        {'class': 'Conv2D', 'filters': 8, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
        {'class': 'Sup3rConcat', 'name': 'sza'},
        {'class': 'Conv2D', 'filters': 2, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
    ]
    disc = [{'class': 'Conv2D', 'filters': 4, 'kernel_size': 3,
             'strides': 2, 'padding': 'same'},
            {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]
    model = Sup3rGan(gen, disc)
    model.meta.update(
        lr_features=['u_100m', 'v_100m', 'sza'],
        hr_out_features=['u_100m', 'v_100m'],
        s_enhance=1, t_enhance=1,
        input_resolution={'spatial': '12km', 'temporal': '60min'})
    stats = {f: 0.0 for f in ['u_100m', 'v_100m', 'sza']}
    model.set_norm_stats(stats, {k: 1.0 for k in stats})
    model.init_weights((1, 8, 8, 3), (1, 8, 8, 2))
    model_dir = str(tmp_path / 'model')
    model.save(model_dir)

    common = dict(
        file_paths=input_file,
        model_kwargs={'model_dir': model_dir},
        model_class='Sup3rGan',
        fwp_chunk_shape=(8, 8, 4), spatial_pad=0, temporal_pad=0,
        out_pattern=None)
    s_win = ForwardPassStrategy(
        **common,
        input_handler_kwargs={'time_slice': slice(4, 12)},
        exo_handler_kwargs={'sza': {
            'cache_dir': str(tmp_path / 'exo1')}})
    s_full = ForwardPassStrategy(
        **common,
        exo_handler_kwargs={'sza': {
            'cache_dir': str(tmp_path / 'exo2')}})
    # the windowed run's first chunk covers file steps 4..8 — its sza
    # chunk must equal the full run's SECOND temporal chunk's sza
    _, exo_win = s_win.prep_chunk_data(0)
    _, exo_full = s_full.prep_chunk_data(1)
    np.testing.assert_allclose(
        exo_win['sza']['steps'][0]['data'],
        exo_full['sza']['steps'][0]['data'], rtol=1e-6)
