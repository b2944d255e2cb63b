"""Streaming (lazy) CC training (VERDICT r4 #5): SolarCC and NCforCC
train from stores the eager path is FORBIDDEN to load, with bit-exact
batch parity vs eager on small data — the same bar as the round-4
plain-handler lazy plane (tests/training/test_lazy_train.py)."""

import numpy as np
import pytest

import sup3r_tpu.utilities.utilities as uu
from sup3r_tpu.configs import get_config
from sup3r_tpu.models import SolarCC, Sup3rGan
from sup3r_tpu.preprocessing import BatchHandler
from sup3r_tpu.preprocessing.batch_handlers import BatchHandlerCC
from sup3r_tpu.preprocessing.data_handlers import (
    DataHandlerH5SolarCC,
    DataHandlerNCforCC,
    DataHandlerNCforCCwithPowerLaw,
)
from sup3r_tpu.utilities.test_helpers import (
    make_fake_h5_file,
    make_fake_nc4_file,
)

SOLAR_FEATS = ['clearsky_ratio', 'ghi', 'clearsky_ghi']


def _reseed():
    uu.RANDOM_GENERATOR.bit_generator.state = np.random.default_rng(
        seed=1234).bit_generator.state


def _nsrdb(tmp_path, shape=(12, 12, 72), name='nsrdb.h5'):
    return make_fake_h5_file(
        str(tmp_path / name), shape, ['ghi', 'clearsky_ghi'],
        start='2023-06-01', freq='h', scale_factor=1.0,
        value_range=(1, 1000))


def _cc_handler(handler, **stats):
    return BatchHandlerCC(
        [handler], batch_size=2, n_batches=3, s_enhance=2, t_enhance=8,
        sample_shape=(8, 8, 24),
        feature_sets={'lr_only_features': ['clearsky_ghi', 'ghi']},
        max_workers=1, **stats)


def test_lazy_cc_batches_match_eager(tmp_path):
    """Same RNG + shared stats -> BatchHandlerCC over the lazy
    H5SolarCC handler emits exactly the eager handler's batches
    (daily LR incl. the s_enhance=2 coarse view, hourly HR incl. the
    daylight-window reduction in DualSamplerCC.__next__)."""
    fp = _nsrdb(tmp_path)
    eager = DataHandlerH5SolarCC(fp, features=SOLAR_FEATS)
    lazy = DataHandlerH5SolarCC(fp, features=SOLAR_FEATS, mode='lazy')
    hourly = eager.data.members['hourly']
    stats = dict(
        means={f: float(np.nanmean(hourly[f])) for f in SOLAR_FEATS},
        stds={f: float(np.nanstd(hourly[f])) for f in SOLAR_FEATS})

    _reseed()
    bh_eager = _cc_handler(eager, **stats)
    eb = [(np.asarray(b.low_res), np.asarray(b.high_res))
          for b in bh_eager]
    bh_eager.stop()

    _reseed()
    bh_lazy = _cc_handler(lazy, **stats)
    lb = [(np.asarray(b.low_res), np.asarray(b.high_res))
          for b in bh_lazy]
    bh_lazy.stop()

    assert len(eb) == len(lb) == 3
    for (elr, ehr), (llr, lhr) in zip(eb, lb):
        np.testing.assert_array_equal(elr, llr)
        np.testing.assert_array_equal(ehr, lhr)


def test_solarcc_train_from_larger_than_ram_store(tmp_path,
                                                  monkeypatch):
    """SolarCC trains from an NSRDB store the eager path must refuse
    (env-capped host RAM): losses finite, weights move."""
    # 16*16*1100*2 vars * 4B ≈ 2.3 MB; cap at 1 MB
    fp = _nsrdb(tmp_path, shape=(16, 16, 1100), name='big_nsrdb.h5')
    monkeypatch.setenv('SUP3R_TPU_HOST_RAM_GB', str(1 / 1024))
    with pytest.raises(MemoryError):
        DataHandlerH5SolarCC(fp, features=SOLAR_FEATS)
    handler = DataHandlerH5SolarCC(fp, features=SOLAR_FEATS,
                                   mode='lazy')
    assert handler.daily.shape[2] == 1100 // 24

    _reseed()
    bh = BatchHandlerCC(
        [handler], batch_size=2, n_batches=2, s_enhance=1, t_enhance=8,
        sample_shape=(12, 12, 24),
        feature_sets={'lr_only_features': ['clearsky_ghi', 'ghi']},
        max_workers=1)
    gen = [
        {'class': 'Conv3D', 'filters': 8, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
        {'class': 'SpatioTemporalExpansion', 'temporal_mult': 8,
         'temporal_method': 'depth_to_time', 't_roll': 4},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'Conv3D', 'filters': 1, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
    ]
    disc = [{'class': 'Conv3D', 'filters': 4, 'kernel_size': 3,
             'strides': 2, 'padding': 'same'},
            {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]
    model = SolarCC(gen, disc, learning_rate=1e-4,
                    loss='MeanAbsoluteError')
    model.train(bh, input_resolution={'spatial': '4km',
                                      'temporal': '1440min'},
                n_epoch=1, weight_gen_advers=0.0, train_gen=True,
                train_disc=False, out_dir=None)
    bh.stop()
    assert np.isfinite(model.history['train_loss_gen'].values[-1])


def test_ncforcc_train_from_larger_than_ram_store(tmp_path,
                                                  monkeypatch):
    """A GAN trains on lazy NCforCC data (clearsky_ratio + wind) from
    a GCM store the eager path must refuse, with the clearsky
    injection streamed per window."""
    from tests.solar_qa.test_solar_qa import _make_fake_nsrdb

    # NetCDF4 (h5py-backed): the lazy windowed-read loader path
    gcm_fp = make_fake_nc4_file(
        str(tmp_path / 'gcm.nc'), (24, 24, 400), ['rsds', 'uas', 'vas'],
        freq='D')
    nsrdb_fp = _make_fake_nsrdb(str(tmp_path / 'nsrdb.h5'),
                                (10, 10, 48))
    monkeypatch.setenv('SUP3R_TPU_HOST_RAM_GB', str(1 / 1024))
    # the power-law variant derives u/v_10m from uas/vas pointwise
    kwargs = dict(features=['clearsky_ratio', 'u_10m', 'v_10m'],
                  nsrdb_source_fp=nsrdb_fp, nsrdb_agg=2)
    with pytest.raises(MemoryError):
        DataHandlerNCforCCwithPowerLaw(gcm_fp, **kwargs)
    handler = DataHandlerNCforCCwithPowerLaw(gcm_fp, mode='lazy',
                                             **kwargs)

    _reseed()
    bh = BatchHandler([handler], batch_size=2, n_batches=2,
                      s_enhance=2, t_enhance=1, sample_shape=(8, 8, 1),
                      max_workers=1)
    gen = [{'class': 'Conv2D', 'filters': 8, 'kernel_size': 3,
            'strides': 1, 'padding': 'same'},
           {'class': 'SpatialExpansion', 'spatial_mult': 2},
           {'class': 'LeakyReLU', 'alpha': 0.2},
           {'class': 'Conv2D', 'filters': 3, 'kernel_size': 3,
            'strides': 1, 'padding': 'same'}]
    model = Sup3rGan(gen, get_config('spatial/disc_test'),
                     learning_rate=1e-4)
    model.train(bh, input_resolution={'spatial': '100km',
                                      'temporal': '1440min'},
                n_epoch=1, out_dir=None)
    bh.stop()
    assert np.isfinite(model.history['train_loss_gen'].values[-1])
