"""Derived-feature matrix across all four registries (mirrors
reference tests/derivers/test_derive_features.py +
test_single_level.py): physics formulas verified against closed forms,
registry remaps, power-law extrapolation, and time/space post-ops."""

import numpy as np
import pandas as pd
import pytest

from sup3r_tpu.preprocessing.data_handlers import (
    DataHandler,
    DataHandlerH5SolarCC,
    DataHandlerNCforCC,
    DataHandlerNCforCCwithPowerLaw,
)
from sup3r_tpu.preprocessing.derivers import Deriver
from sup3r_tpu.preprocessing.rasterizers import Rasterizer
from sup3r_tpu.utilities.test_helpers import (
    make_fake_h5_file,
    make_fake_nc_file,
)


def test_surface_rh_magnus(tmp_path):
    """relativehumidity_2m from d2m + temperature_2m matches the
    Magnus closed form."""
    fp = make_fake_nc_file(str(tmp_path / 'era.nc'), (5, 5, 4),
                           ['d2m', 'temperature_2m'])
    dh = DataHandler(fp, features=['relativehumidity_2m'])
    raw = Rasterizer(fp).data
    d2m, t2m = raw['d2m'], raw['temperature_2m']
    wvp = 6.1078 * np.exp(17.1 * d2m / (235 + d2m))
    svp = 6.1078 * np.exp(17.1 * t2m / (235 + t2m))
    np.testing.assert_allclose(dh.data['relativehumidity_2m'],
                               100 * wvp / svp, rtol=1e-5)


def test_clearsky_ratio_nighttime_nan(tmp_path):
    """clearsky_ratio is NaN for timesteps with nighttime anywhere on
    the grid; cloud_mask mirrors that behavior."""
    shape = (4, 4, 6)
    raw = Rasterizer(make_fake_nc_file(
        str(tmp_path / 'x.nc'), shape, ['ghi', 'clearsky_ghi'])).data
    cs = np.full(shape, 100.0, np.float32)
    cs[..., 2] = 0.5  # nighttime timestep
    raw.data_vars['clearsky_ghi'] = cs
    raw.data_vars['ghi'] = np.full(shape, 50.0, np.float32)
    deriver = Deriver(raw, ['clearsky_ratio'],
                      nan_method_kwargs=None)
    csr = np.asarray(deriver.data['clearsky_ratio'])
    assert np.isnan(csr[..., 2]).all()
    np.testing.assert_allclose(csr[..., 0], 0.5, rtol=1e-6)


def test_wind_u_v_roundtrip_at_height(tmp_path):
    """u/v derived from ws/wd re-derive the original ws/wd."""
    fp = make_fake_h5_file(
        str(tmp_path / 'wtk.h5'), (6, 6, 4),
        ['windspeed_80m', 'winddirection_80m'],
        value_range=(0, 359))
    dh = DataHandler(fp, features=['u_80m', 'v_80m'])
    raw = Rasterizer(fp).data
    ws = np.hypot(np.asarray(dh.data['u_80m']),
                  np.asarray(dh.data['v_80m']))
    np.testing.assert_allclose(ws, raw['windspeed_80m'], atol=0.2)


def test_ncforcc_registry_remaps(tmp_path):
    """NCforCC: ua->u, tas->temperature_2m (K->C), hurs->rh."""
    fp = make_fake_nc_file(str(tmp_path / 'gcm.nc'), (5, 5, 4),
                           ['uas', 'vas', 'tas', 'hurs'])
    raw = Rasterizer(fp).data
    raw.data_vars['tas'] = raw['tas'] + 290.0  # Kelvin-ish
    from sup3r_tpu.preprocessing.derivers import RegistryNCforCC

    class _D(Deriver):
        FEATURE_REGISTRY = RegistryNCforCC

    raw2 = Rasterizer(fp).data
    raw2.data_vars['tas'] = raw['tas']
    d = _D(raw2, ['temperature_2m', 'relativehumidity_2m'])
    np.testing.assert_allclose(d.data['temperature_2m'],
                               raw['tas'] - 273.15, rtol=1e-5)
    np.testing.assert_allclose(d.data['relativehumidity_2m'],
                               raw['hurs'], rtol=1e-6)


def test_power_law_extrapolation(tmp_path):
    """PowerLaw registry: u_100m = uas * (100/10)^0.2 (reference:
    derivers/methods.py UWindPowerLaw)."""
    fp = make_fake_nc_file(str(tmp_path / 'gcm.nc'), (5, 5, 4),
                           ['uas', 'vas'])
    from sup3r_tpu.preprocessing.derivers import (
        RegistryNCforCCwithPowerLaw,
    )

    class _D(Deriver):
        FEATURE_REGISTRY = RegistryNCforCCwithPowerLaw

    raw = Rasterizer(fp).data
    d = _D(raw, ['u_100m', 'v_40m'])
    factor100 = (100.0 / 10.0) ** 0.2
    factor40 = (40.0 / 10.0) ** 0.2
    np.testing.assert_allclose(d.data['u_100m'],
                               raw['uas'] * factor100, rtol=1e-5)
    np.testing.assert_allclose(d.data['v_40m'],
                               raw['vas'] * factor40, rtol=1e-5)


def test_solarcc_u_v_from_wind_speed_direction(tmp_path):
    """H5SolarCC registry derives u/v from the NSRDB wind_speed /
    wind_direction names."""
    fp = make_fake_h5_file(str(tmp_path / 'nsrdb.h5'), (5, 5, 4),
                           ['wind_speed', 'wind_direction'],
                           value_range=(0, 300))
    from sup3r_tpu.preprocessing.derivers import RegistryH5SolarCC

    class _D(Deriver):
        FEATURE_REGISTRY = RegistryH5SolarCC

    raw = Rasterizer(fp).data
    d = _D(raw, ['u', 'v'])
    ws = np.hypot(np.asarray(d.data['u']), np.asarray(d.data['v']))
    np.testing.assert_allclose(ws, raw['wind_speed'], atol=0.2)


def test_time_encodings_and_latlon_features(tmp_path):
    fp = make_fake_nc_file(str(tmp_path / 'x.nc'), (4, 4, 24),
                           ['u100'])
    raw = Rasterizer(fp).data
    d = Deriver(raw, ['latitude_feature', 'longitude_feature',
                      'sod_encoding', 'soy_encoding'])
    lat_f = np.asarray(d.data['latitude_feature'])
    assert lat_f.shape == (4, 4, 24)
    np.testing.assert_allclose(lat_f[..., 0], raw.lat_lon[..., 0],
                               rtol=1e-5)
    sod = np.asarray(d.data['sod_encoding'])
    assert sod.min() >= -1 and sod.max() <= 1
    assert np.std(sod[0, 0]) > 0  # varies over the day


def test_time_roll_and_shift(tmp_path):
    fp = make_fake_nc_file(str(tmp_path / 'x.nc'), (4, 4, 12),
                           ['u100'])
    raw = Rasterizer(fp).data
    base = np.asarray(raw['u_100m']).copy()
    d = Deriver(Rasterizer(fp).data, ['u_100m'], time_roll=3)
    np.testing.assert_allclose(d.data['u_100m'],
                               np.roll(base, 3, axis=2), rtol=1e-6)


def test_hr_spatial_coarsen(tmp_path):
    fp = make_fake_nc_file(str(tmp_path / 'x.nc'), (8, 8, 4),
                           ['u100'])
    raw = Rasterizer(fp).data
    base = np.asarray(raw['u_100m']).copy()
    d = Deriver(Rasterizer(fp).data, ['u_100m'], hr_spatial_coarsen=2)
    assert d.data['u_100m'].shape == (4, 4, 4)
    expected = base.reshape(4, 2, 4, 2, 4).mean(axis=(1, 3))
    np.testing.assert_allclose(d.data['u_100m'], expected, rtol=1e-5)
    assert d.data.lat_lon.shape == (4, 4, 2)


def test_unknown_feature_raises(tmp_path):
    fp = make_fake_nc_file(str(tmp_path / 'x.nc'), (4, 4, 4), ['u100'])
    raw = Rasterizer(fp).data
    with pytest.raises(RuntimeError, match='Could not find'):
        Deriver(raw, ['definitely_not_a_feature'])
