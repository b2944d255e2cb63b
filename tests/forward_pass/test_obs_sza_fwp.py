"""Forward pass with observation-fusion and sza exogenous rasters."""

import numpy as np
import pytest

from sup3r_tpu.models import Sup3rGan, Sup3rGanWithObs
from sup3r_tpu.pipeline import ForwardPass, ForwardPassStrategy
from sup3r_tpu.utilities.test_helpers import (
    make_fake_h5_file,
    make_fake_nc_file,
)


def _obs_gan(tmp_path):
    features = ['u_100m', 'v_100m']
    gen = [
        {'class': 'Conv2D', 'filters': 32, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
        {'class': 'SpatialExpansion', 'spatial_mult': 2},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'Sup3rConcatObs', 'name': 'u_100m_obs'},
        {'class': 'Conv2D', 'filters': 2, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
    ]
    disc = [{'class': 'Conv2D', 'filters': 4, 'kernel_size': 3,
             'strides': 2, 'padding': 'same'},
            {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]
    model = Sup3rGanWithObs(gen, disc)
    model.meta.update(lr_features=features, hr_out_features=features,
                      s_enhance=2, t_enhance=1,
                      input_resolution={'spatial': '12km',
                                        'temporal': '60min'})
    model.set_norm_stats({f: 0.0 for f in features},
                         {f: 1.0 for f in features})
    model.init_weights((1, 5, 5, 2), (1, 10, 10, 2))
    d = str(tmp_path / 'obs_model')
    model.save(d)
    return d


def test_fwp_with_sparse_obs_exo(tmp_path):
    """Sparse station observations rasterized (NaN off-station) and
    fused mid-network at inference."""
    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'),
                                   (10, 10, 3), ['u100', 'v100'])
    # sparse 'stations': a small h5 with few sites inside the domain
    obs_file = make_fake_h5_file(
        str(tmp_path / 'obs.h5'), (3, 3, 3), ['u_100m'],
        lat_range=(39.9, 39.2), lon_range=(-105.3, -104.5))
    model_dir = _obs_gan(tmp_path)
    strategy = ForwardPassStrategy(
        file_paths=input_file,
        model_kwargs={'model_dir': model_dir},
        model_class='Sup3rGanWithObs',
        fwp_chunk_shape=(10, 10, 3), spatial_pad=0, temporal_pad=0,
        exo_handler_kwargs={'u_100m_obs': {
            'source_file': obs_file,
            'cache_dir': str(tmp_path / 'exo')}},
        out_pattern=None)
    steps = strategy.exo_data['u_100m_obs']['steps']
    assert [s['combine_type'] for s in steps] == ['layer']
    raster = steps[0]['data']
    # sparse: some NaN (no station) and some finite cells
    assert np.isnan(raster).any() and np.isfinite(raster).any()
    outputs = ForwardPass.run(strategy, 0)
    assert outputs[0].shape == (20, 20, 3, 2)
    assert np.isfinite(outputs[0]).all()


def test_fwp_with_sza_exo(tmp_path):
    """Analytic sza raster injected mid-network at inference."""
    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'),
                                   (8, 8, 4), ['u100', 'v100'])
    features = ['u_100m', 'v_100m']
    gen = [
        {'class': 'Conv2D', 'filters': 32, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
        {'class': 'SpatialExpansion', 'spatial_mult': 2},
        {'class': 'Sup3rConcat', 'name': 'sza'},
        {'class': 'Conv2D', 'filters': 2, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
    ]
    disc = [{'class': 'Conv2D', 'filters': 4, 'kernel_size': 3,
             'strides': 2, 'padding': 'same'},
            {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]
    model = Sup3rGan(gen, disc)
    model.meta.update(lr_features=features, hr_out_features=features,
                      s_enhance=2, t_enhance=1,
                      input_resolution={'spatial': '12km',
                                        'temporal': '60min'})
    model.set_norm_stats({f: 0.0 for f in features},
                         {f: 1.0 for f in features})
    model.init_weights((1, 4, 4, 2), (1, 8, 8, 2))
    model_dir = str(tmp_path / 'sza_model')
    model.save(model_dir)
    strategy = ForwardPassStrategy(
        file_paths=input_file,
        model_kwargs={'model_dir': model_dir},
        fwp_chunk_shape=(8, 8, 4), spatial_pad=0, temporal_pad=0,
        exo_handler_kwargs={'sza': {}},
        out_pattern=None)
    raster = strategy.exo_data['sza']['steps'][0]['data']
    assert raster.ndim == 4  # (s1, s2, t, 1) time-dependent
    assert 0 <= np.nanmin(raster) and np.nanmax(raster) <= 180
    outputs = ForwardPass.run(strategy, 0)
    assert outputs[0].shape == (16, 16, 4, 2)


def test_obs_raster_is_spatiotemporal(tmp_path):
    """The obs raster carries PER-TIMESTEP station values (reference:
    rasterizers/exo.py ObsRasterizer._get_data_3d) — a static
    first-instant field fed to every chunk was the round-3 review
    finding."""
    import h5py

    from sup3r_tpu.preprocessing.exo import ObsRasterizer

    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'),
                                   (10, 10, 4), ['u100', 'v100'])
    obs_file = make_fake_h5_file(
        str(tmp_path / 'obs.h5'), (3, 3, 4), ['u_100m'],
        lat_range=(39.9, 39.2), lon_range=(-105.3, -104.5))
    # give the stations a strong, known time trend
    with h5py.File(obs_file, 'a') as f:
        sf = f['u_100m'].attrs.get('scale_factor', 1)
        t_len, n = f['u_100m'].shape
        vals = np.arange(t_len)[:, None] * np.ones((1, n))
        f['u_100m'][...] = (vals * sf).astype(f['u_100m'].dtype)
    rast = ObsRasterizer(file_paths=input_file, source_file=obs_file,
                         feature='u_100m_obs', s_enhance=2,
                         t_enhance=1)
    data = rast.get_data()
    assert data.shape == (20, 20, 4, 1)
    finite = np.isfinite(data[..., 0])
    assert finite.any() and (~finite).any()
    # observed cells track the per-timestep trend
    cell = np.argwhere(finite[:, :, 0])[0]
    series = data[cell[0], cell[1], :, 0]
    assert np.all(np.isfinite(series))
    assert np.all(np.diff(series) > 0.5)
