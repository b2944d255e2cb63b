"""Full production chain: raw files -> cached DataHandlers ->
BatchHandler -> GAN training -> saved model -> chunked forward pass to
h5 chunk files -> CollectorH5 -> final h5 -> QA vs source.

Mirrors reference tests/training/test_end_to_end.py plus the collect +
QA tail from its pipeline tests."""

import glob
import os

import h5py
import numpy as np

from sup3r_tpu.models import Sup3rGan
from sup3r_tpu.pipeline import ForwardPass, ForwardPassStrategy
from sup3r_tpu.postprocessing.collectors import CollectorH5
from sup3r_tpu.preprocessing import BatchHandler, DataHandler
from sup3r_tpu.utilities.test_helpers import make_fake_nc_file

FEATURES = ['u_100m', 'v_100m']


def _st_gen_config():
    return {'hidden_layers': [
        {'class': 'Conv3D', 'filters': 16, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'SpatioTemporalExpansion', 'spatial_mult': 2,
         'temporal_mult': 2, 'temporal_method': 'nearest'},
        {'class': 'Conv3D', 'filters': 2, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
    ]}


def _st_disc_config():
    return {'hidden_layers': [
        {'class': 'Conv3D', 'filters': 8, 'kernel_size': 3,
         'strides': 2, 'padding': 'same'},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'Flatten'},
        {'class': 'Dense', 'units': 1},
    ]}


def test_end_to_end(tmp_path):
    train_fp = make_fake_nc_file(str(tmp_path / 'train.nc'),
                                 (12, 12, 40), ['u100', 'v100'])
    val_fp = make_fake_nc_file(str(tmp_path / 'val.nc'), (12, 12, 24),
                               ['u100', 'v100'], start='2023-02-01')

    # data handlers with feature caching, reloaded from cache
    cache_train = str(tmp_path / 'cache' / 'train_{feature}.h5')
    train_h = DataHandler(
        train_fp, features=FEATURES,
        cache_kwargs={'cache_pattern': cache_train})
    assert glob.glob(cache_train.replace('{feature}', '*'))
    train_cached = DataHandler(
        train_fp, features=FEATURES,
        cache_kwargs={'cache_pattern': cache_train})
    np.testing.assert_allclose(
        np.asarray(train_h.data.as_array(FEATURES)),
        np.asarray(train_cached.data.as_array(FEATURES)), rtol=1e-6)
    val_h = DataHandler(val_fp, features=FEATURES)

    handler = BatchHandler([train_cached], [val_h], batch_size=2,
                           n_batches=2, s_enhance=2, t_enhance=2,
                           sample_shape=(8, 8, 8))

    model = Sup3rGan(_st_gen_config(), _st_disc_config(),
                     learning_rate=1e-4)
    out_dir = os.path.join(tmp_path, 'gan_{epoch}')
    model.train(handler, input_resolution={'spatial': '12km',
                                           'temporal': '60min'},
                n_epoch=2, weight_gen_advers=1e-3, train_gen=True,
                train_disc=True, out_dir=out_dir, checkpoint_int=1)
    model_dir = os.path.join(tmp_path, 'gan_1')
    assert os.path.exists(os.path.join(model_dir, 'model_params.json'))

    # chunked inference with the trained model, writing h5 chunk files
    fwp_input = make_fake_nc_file(str(tmp_path / 'fwp_in.nc'),
                                  (12, 12, 8), ['u100', 'v100'],
                                  start='2024-01-01')
    out_pattern = str(tmp_path / 'out' / 'chunk_{file_id}.h5')
    strategy = ForwardPassStrategy(
        file_paths=fwp_input,
        model_kwargs={'model_dir': model_dir},
        fwp_chunk_shape=(6, 6, 8), spatial_pad=1, temporal_pad=0,
        out_pattern=out_pattern)
    ForwardPass.run(strategy, 0)
    chunk_files = sorted(glob.glob(str(tmp_path / 'out' / 'chunk_*.h5')))
    assert len(chunk_files) == strategy.fwp_slicer.n_chunks == 4

    # collect chunk files into the final h5
    collected = str(tmp_path / 'collected.h5')
    CollectorH5.collect(chunk_files, collected,
                        features=['windspeed_100m',
                                  'winddirection_100m'])
    with h5py.File(collected, 'r') as f:
        assert f['windspeed_100m'].shape == (16, 24 * 24)
        ws = f['windspeed_100m'][...].astype(np.float32)
        ws = ws / f['windspeed_100m'].attrs.get('scale_factor', 1.0)
        assert np.isfinite(ws).all()
        assert 'meta' in f and f['meta'].shape[0] == 24 * 24
        assert len(f['time_index'][...]) == 16

    # incremental restart: nothing left to do
    strategy2 = ForwardPassStrategy(
        file_paths=fwp_input,
        model_kwargs={'model_dir': model_dir},
        fwp_chunk_shape=(6, 6, 8), spatial_pad=1, temporal_pad=0,
        out_pattern=out_pattern, incremental=True)
    assert all(strategy2.chunk_finished(i)
               for i in range(strategy2.fwp_slicer.n_chunks))
