"""Sup3rCC-style end-to-end chain: daily GCM-like input ->
SolarMultiStepGan chunked forward pass -> chunk h5 files -> Solar
module -> GHI/DNI/DHI irradiance files.

Mirrors the reference's production Sup3rCC workflow
(examples/sup3rcc + tests/forward_pass/test_solar_module.py).
"""

import os

import h5py
import numpy as np
import pytest

from sup3r_tpu.models import Sup3rGan
from sup3r_tpu.pipeline import ForwardPass, ForwardPassStrategy
from sup3r_tpu.solar import Solar
from sup3r_tpu.utilities.test_helpers import make_fake_nc_file
from tests.solar_qa.test_solar_qa import _make_fake_nsrdb


def _spatial_gan(tmp_path, name, features, n_out):
    gen = [
        {'class': 'Conv2D', 'filters': 8 * 4, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
        {'class': 'SpatialExpansion', 'spatial_mult': 2},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'Conv2D', 'filters': n_out, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
    ]
    disc = [{'class': 'Conv2D', 'filters': 4, 'kernel_size': 3,
             'strides': 2, 'padding': 'same'},
            {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]
    model = Sup3rGan(gen, disc)
    model.meta.update(lr_features=features,
                      hr_out_features=features[:n_out],
                      s_enhance=2, t_enhance=1,
                      input_resolution={'spatial': '100km',
                                        'temporal': '1440min'})
    model.set_norm_stats({f: 0.0 for f in features},
                         {f: 1.0 for f in features})
    model.init_weights((1, 4, 4, len(features)),
                       (1, 8, 8, n_out))
    d = str(tmp_path / name)
    model.save(d)
    return d


def _temporal_solar_gan(tmp_path):
    features = ['clearsky_ratio', 'u_200m', 'v_200m']
    gen = [
        {'class': 'Conv3D', 'filters': 24, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
        {'class': 'SpatioTemporalExpansion', 'temporal_mult': 24,
         'temporal_method': 'depth_to_time', 't_roll': 12},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'Conv3D', 'filters': 1, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
    ]
    disc = [{'class': 'Conv3D', 'filters': 4, 'kernel_size': 3,
             'strides': 2, 'padding': 'same'},
            {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]
    model = Sup3rGan(gen, disc)
    model.meta.update(lr_features=features,
                      hr_out_features=['clearsky_ratio'],
                      s_enhance=1, t_enhance=24,
                      input_resolution={'spatial': '50km',
                                        'temporal': '1440min'})
    model.set_norm_stats(
        {'clearsky_ratio': 0.5, 'u_200m': 0.0, 'v_200m': 0.0},
        {'clearsky_ratio': 0.2, 'u_200m': 1.0, 'v_200m': 1.0})
    model.init_weights((1, 8, 8, 2, 3), (1, 8, 8, 48, 1))
    d = str(tmp_path / 'tsm')
    model.save(d)
    return d


def test_sup3rcc_chain(tmp_path):
    # input: 2 days of daily GCM-like data on an 8x8 grid
    input_file = make_fake_nc_file(
        str(tmp_path / 'gcm.nc'), (8, 8, 2),
        ['clearsky_ratio', 'u_200m', 'v_200m'], freq='D',
        start='2050-06-01')
    ssm = _spatial_gan(tmp_path, 'ssm', ['clearsky_ratio'], 1)
    swm = _spatial_gan(tmp_path, 'swm', ['u_200m', 'v_200m'], 2)
    tsm = _temporal_solar_gan(tmp_path)

    out_pattern = str(tmp_path / 'out' / 'sup3r_chunk_{file_id}.h5')
    strategy = ForwardPassStrategy(
        file_paths=input_file,
        model_class='SolarMultiStepGan',
        model_kwargs={'spatial_solar_model_dirs': ssm,
                      'spatial_wind_model_dirs': swm,
                      'temporal_solar_model_dirs': tsm},
        fwp_chunk_shape=(8, 8, 1),
        spatial_pad=0, temporal_pad=0,
        out_pattern=out_pattern)
    assert strategy.s_enhance == 2 and strategy.t_enhance == 24
    assert strategy.fwp_slicer.n_chunks == 2
    ForwardPass.run(strategy, 0)
    chunk_files = sorted((tmp_path / 'out').glob('sup3r_chunk_*.h5'))
    assert len(chunk_files) == 2
    with h5py.File(chunk_files[0], 'r') as f:
        assert 'clearsky_ratio' in f
        assert f['clearsky_ratio'].shape == (24, 256)

    # solar module: csr chunks + NSRDB clearsky -> irradiance
    nsrdb_fp = _make_fake_nsrdb(str(tmp_path / 'nsrdb.h5'),
                                (20, 20, 96), start='2050-06-01')
    written = Solar.run_temporal_chunks(
        str(tmp_path / 'out' / 'sup3r_chunk_*.h5'), nsrdb_fp, tz=-6)
    assert len(written) == 2
    with h5py.File(written[0], 'r') as f:
        assert f['ghi'].shape == (24, 256)
        ghi = f['ghi'][:] / f['ghi'].attrs['scale_factor']
        dni = f['dni'][:] / f['dni'].attrs['scale_factor']
        assert (ghi >= 0).all() and (dni >= 0).all()
        assert ghi.max() > 0
