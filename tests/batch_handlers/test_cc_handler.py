"""Climate-change (daily/hourly) sampler + batch handler tests
(mirrors reference tests/batch_handlers/test_bh_h5_cc.py)."""

import numpy as np
import pandas as pd
import pytest

from sup3r_tpu.preprocessing.batch_handlers import BatchHandlerCC
from sup3r_tpu.preprocessing.grid import GridDataset, PairedDataset
from sup3r_tpu.preprocessing.samplers import (
    DualSamplerCC,
    nsrdb_reduce_daily_data,
)
from sup3r_tpu.utilities import RANDOM_GENERATOR


def _daily_hourly(s1=20, s2=20, n_days=5, solar=True):
    t = n_days * 24
    ti = pd.date_range('2023-06-01', periods=t, freq='h')
    data = RNG_DATA = RANDOM_GENERATOR.random(
        (s1, s2, t, 2)).astype(np.float32)
    features = ['clearsky_ratio', 'u_100m'] if solar else ['u_100m',
                                                           'v_100m']
    if solar:
        # night NaNs outside hours 8-16
        night = ~np.isin(ti.hour, range(8, 16))
        data[:, :, night, 0] = np.nan
    lat = np.linspace(40, 39, s1)
    lon = np.linspace(-105.5, -104.3, s2)
    lat_lon = np.dstack(np.meshgrid(lat, lon, indexing='ij'))
    hourly = GridDataset(data, features, lat_lon=lat_lon,
                         time_index=ti)
    day_ids = pd.DatetimeIndex(ti.date)
    days = day_ids.unique()
    daily_arr = np.stack([
        np.nanmean(data[:, :, day_ids == d], axis=2) for d in days],
        axis=2)
    daily = GridDataset(daily_arr, features, lat_lon=lat_lon,
                        time_index=pd.DatetimeIndex(days))
    return PairedDataset(daily=daily, hourly=hourly)


def test_nsrdb_reduce_daily_data():
    data = RANDOM_GENERATOR.random((1, 4, 4, 24, 1)).astype(np.float32)
    data[..., :8, 0] = np.nan
    data[..., 16:, 0] = np.nan
    out = nsrdb_reduce_daily_data(data, 8, csr_ind=0)
    assert out.shape == (1, 4, 4, 8, 1)
    assert not np.isnan(out[..., 0]).any()


def test_dual_sampler_cc_solar():
    """t_enhance=8: 24h HR sample reduced to 8 daylight hours, 1-day
    LR sample; NaNs filled."""
    paired = _daily_hourly()
    sampler = DualSamplerCC(paired, sample_shape=(8, 8, 8),
                            s_enhance=1, t_enhance=8)
    lr, hr = next(sampler)
    assert lr.shape == (8, 8, 1, 2)
    assert hr.shape == (8, 8, 8, 2)
    assert not np.isnan(hr).any()


def test_dual_sampler_cc_24x():
    """t_enhance=24: full-day HR samples."""
    paired = _daily_hourly(solar=False)
    sampler = DualSamplerCC(paired, sample_shape=(8, 8, 48),
                            s_enhance=1, t_enhance=24)
    lr, hr = next(sampler)
    assert lr.shape == (8, 8, 2, 2)
    assert hr.shape == (8, 8, 48, 2)


def test_dual_sampler_cc_spatial_coarsen():
    """s_enhance > 1 coarsens the daily member for the LR side."""
    paired = _daily_hourly(solar=False)
    sampler = DualSamplerCC(paired, sample_shape=(8, 8, 24),
                            s_enhance=2, t_enhance=24)
    lr, hr = next(sampler)
    assert lr.shape == (4, 4, 1, 2)
    assert hr.shape == (8, 8, 24, 2)


def test_batch_handler_cc():
    paired = _daily_hourly()
    handler = BatchHandlerCC([paired], batch_size=2, n_batches=2,
                             s_enhance=1, t_enhance=8,
                             sample_shape=(8, 8, 8))
    batches = list(handler)
    handler.stop()
    assert len(batches) == 2
    for b in batches:
        assert b.low_res.shape == (2, 8, 8, 1, 2)
        assert b.high_res.shape == (2, 8, 8, 8, 2)
        assert not np.isnan(b.high_res).any()


def test_train_cc_with_topo_exo(tmp_path):
    """Wind-CC training with mid-network topography exo (reference:
    tests/training/test_train_exo_cc.py): DualSamplerCC feature split
    routes topography to hr_exo, the generator consumes it via
    Sup3rConcat, and a short train run completes with finite losses."""
    import os

    from sup3r_tpu.models import Sup3rGan

    paired = _daily_hourly(solar=False)
    # add a (time-invariant) topography channel to both members
    topo = RANDOM_GENERATOR.random(
        (*paired.hourly.data.shape[:2], 1)).astype(np.float32)
    for member in (paired.daily, paired.hourly):
        t = member.data.shape[2]
        member['topography'] = np.repeat(topo, t, axis=2)

    handler = BatchHandlerCC(
        [paired], batch_size=2, n_batches=2, s_enhance=1, t_enhance=24,
        sample_shape=(8, 8, 24),
        feature_sets={'features': ['u_100m', 'v_100m', 'topography'],
                      'hr_exo_features': ['topography'],
                      'lr_only_features': []})
    gen = {'hidden_layers': [
        {'class': 'Conv3D', 'filters': 8, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
        {'class': 'SpatioTemporalExpansion', 'temporal_mult': 24,
         'temporal_method': 'nearest'},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': 'Sup3rConcat', 'name': 'topography'},
        {'class': 'Conv3D', 'filters': 2, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'}]}
    disc = {'hidden_layers': [
        {'class': 'Conv3D', 'filters': 4, 'kernel_size': 3,
         'strides': 2, 'padding': 'same'},
        {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]}
    model = Sup3rGan(gen, disc, learning_rate=1e-4)
    model.train(handler, input_resolution={'spatial': '4km',
                                           'temporal': '1440min'},
                n_epoch=2, weight_gen_advers=1e-4, train_gen=True,
                train_disc=True,
                out_dir=os.path.join(tmp_path, 'cc_{epoch}'))
    assert model.hr_exo_features == ['topography']
    assert model.hr_out_features == ['u_100m', 'v_100m']
    assert np.isfinite(model.history['train_loss_gen'].values).all()


@pytest.mark.parametrize('custom_layer', ['Sup3rAdder', 'Sup3rConcat'])
def test_train_cc_exo_with_lr_only_feature(tmp_path, custom_layer):
    """Wind-CC exo training with an lr-only feature in the mix
    (reference: tests/training/test_train_exo_cc.py parameter sets
    with lr_only_features=['temperature_100m']): temperature feeds
    the generator input only, topography is mid-network exo, and the
    disc/content losses see exactly the two hr output channels."""
    import os

    from sup3r_tpu.models import Sup3rGan

    paired = _daily_hourly(solar=False)
    topo = RANDOM_GENERATOR.random(
        (*paired.hourly.data.shape[:2], 1)).astype(np.float32)
    temp = RANDOM_GENERATOR.random(
        (*paired.hourly.data.shape[:2], 1)).astype(np.float32)
    for member in (paired.daily, paired.hourly):
        t = member.data.shape[2]
        member['temperature_100m'] = np.repeat(temp, t, axis=2)
        member['topography'] = np.repeat(topo, t, axis=2)

    handler = BatchHandlerCC(
        [paired], batch_size=2, n_batches=2, s_enhance=1, t_enhance=24,
        sample_shape=(8, 8, 24),
        feature_sets={'features': ['temperature_100m', 'u_100m',
                                   'v_100m', 'topography'],
                      'lr_only_features': ['temperature_100m'],
                      'hr_exo_features': ['topography']})
    gen = {'hidden_layers': [
        {'class': 'Conv3D', 'filters': 8, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'},
        {'class': 'SpatioTemporalExpansion', 'temporal_mult': 24,
         'temporal_method': 'nearest'},
        {'class': 'LeakyReLU', 'alpha': 0.2},
        {'class': custom_layer, 'name': 'topography'},
        {'class': 'Conv3D', 'filters': 2, 'kernel_size': 3,
         'strides': 1, 'padding': 'same'}]}
    disc = {'hidden_layers': [
        {'class': 'Conv3D', 'filters': 4, 'kernel_size': 3,
         'strides': 2, 'padding': 'same'},
        {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]}
    model = Sup3rGan(gen, disc, learning_rate=1e-4)
    model.train(handler, input_resolution={'spatial': '4km',
                                           'temporal': '1440min'},
                n_epoch=1, weight_gen_advers=1e-4, train_gen=True,
                train_disc=True,
                out_dir=os.path.join(tmp_path, 'cc_{epoch}'))
    # lr feature order follows the container's channel order (u/v
    # pre-existing, temperature/topography appended above)
    assert model.lr_features == ['u_100m', 'v_100m',
                                 'temperature_100m', 'topography']
    assert model.hr_out_features == ['u_100m', 'v_100m']
    assert model.hr_exo_features == ['topography']
    assert np.isfinite(model.history['train_loss_gen'].values).all()
    # inference: 4 lr features in, topo exo at hr, 2 channels out
    x = RANDOM_GENERATOR.random((1, 8, 8, 1, 4)).astype(np.float32)
    hr_topo = RANDOM_GENERATOR.random((1, 8, 8, 24, 1)).astype(
        np.float32)
    exo = {'topography': {'steps': [
        {'model': 0, 'combine_type': 'layer', 'data': hr_topo}]}}
    y = model.generate(x, exogenous_data=exo)
    assert y.shape == (1, 8, 8, 24, 2)


def test_dual_sampler_cc_lr_matches_daily_mean():
    """Non-solar t_enhance=24: the LR sample equals the day-mean of
    the HR sample (lr comes from the daily member, hr from the hourly
    member, same window; reference: tests/samplers/test_cc.py:38-103)."""
    paired = _daily_hourly(solar=False)
    sampler = DualSamplerCC(paired, sample_shape=(8, 8, 48),
                            s_enhance=1, t_enhance=24)
    for _ in range(4):
        lr, hr = next(sampler)
        day_mean = hr.reshape(8, 8, 2, 24, 2).mean(axis=3)
        np.testing.assert_allclose(lr, day_mean, atol=1e-5)


def test_dual_sampler_cc_wind_features_not_reduced():
    """With wind features alongside csr, only the csr channel drives
    the daylight-window reduction; wind values keep their hourly
    magnitudes (reference: tests/samplers/test_cc.py:148-193)."""
    paired = _daily_hourly(solar=True)
    sampler = DualSamplerCC(paired, sample_shape=(8, 8, 8),
                            s_enhance=1, t_enhance=8)
    lr, hr = next(sampler)
    # csr channel: all finite (daylight window); u channel untouched
    assert not np.isnan(hr[..., 0]).any()
    assert not np.isnan(hr[..., 1]).any()
    assert hr.shape == (8, 8, 8, 2)
    # the daylight window selects hours whose csr is finite in the
    # source, i.e. hours 8-16
    assert lr.shape == (8, 8, 1, 2)


def test_nsrdb_reduce_daily_keeps_center_of_daylight():
    """The reduced window is centered on the daylight (finite-csr)
    hours (reference: samplers/utilities.py nsrdb_reduce_daily_data)."""
    data = np.full((1, 4, 4, 24, 1), np.nan, np.float32)
    data[..., 9:17, 0] = 1.0  # daylight 9-17
    out = nsrdb_reduce_daily_data(data, 8, csr_ind=0)
    assert out.shape == (1, 4, 4, 8, 1)
    np.testing.assert_allclose(out[..., 0], 1.0)


def test_cc_stats_use_hourly_member_nan_aware():
    """BatchHandlerCC stats come from the HOURLY member with NaN
    nights skipped — the daily totals-ratio csr is a different
    statistic (reference: tests/batch_handlers/test_bh_h5_cc.py:116
    test_solar_batch_nan_stats; stats from c.high_res)."""
    from sup3r_tpu.preprocessing.stats import StatsCollection

    paired = _daily_hourly()
    hourly_csr = np.asarray(paired['hourly']['clearsky_ratio'])
    true_mean = float(np.nanmean(hourly_csr))
    true_std = float(np.nanstd(hourly_csr))
    stats = StatsCollection([paired])
    assert np.isclose(stats.means['clearsky_ratio'], true_mean,
                      rtol=1e-5)
    assert np.isclose(stats.stds['clearsky_ratio'], true_std,
                      rtol=1e-5)

