"""DataHandler-level bias correction conveniences: ``lin_bc`` (annual
and monthly factor selection) and ``qdm_bc`` mutate the handler's data
in place from factor files (reference: sup3r/bias/utilities.py:22-218,
exercised by the reference's qdm_bc tests at
tests/bias/test_qdm_bias_correction.py:315)."""

import json

import h5py
import numpy as np
import pandas as pd
import pytest

from sup3r_tpu.bias import lin_bc, local_qdm_bc, qdm_bc
from sup3r_tpu.bias.qdm_math import sampled_quantiles
from sup3r_tpu.bias.transforms import get_date_range_kwargs
from sup3r_tpu.preprocessing.data_handlers import DataHandler
from sup3r_tpu.utilities.test_helpers import make_fake_nc_file

RNG = np.random.default_rng(5)
S = 8
NQ = 11


def _handler(tmp_path, t=30, freq='D', start='2019-11-16'):
    fp = make_fake_nc_file(
        str(tmp_path / 'input.nc'), (S, S, t), ['u100', 'v100'],
        start=start, freq=freq,
        lat_range=(40.0, 39.0), lon_range=(-105.5, -104.3))
    return DataHandler(fp, features=['u_100m', 'v_100m'])


def _coords(handler):
    ll = np.asarray(handler.lat_lon)
    return ll[..., 0], ll[..., 1]


def test_lin_bc_annual(tmp_path):
    handler = _handler(tmp_path)
    lat, lon = _coords(handler)
    fp = str(tmp_path / 'lin.h5')
    with h5py.File(fp, 'w') as f:
        f.create_dataset('latitude', data=lat)
        f.create_dataset('longitude', data=lon)
        f.create_dataset('u_100m_scalar',
                         data=2 * np.ones((S, S, 1), np.float32))
        f.create_dataset('u_100m_adder',
                         data=np.ones((S, S, 1), np.float32))
    before_u = np.asarray(handler.data['u_100m']).copy()
    before_v = np.asarray(handler.data['v_100m']).copy()
    done = lin_bc(handler, fp)
    assert done == ['u_100m']
    np.testing.assert_allclose(
        np.asarray(handler.data['u_100m']), before_u * 2 + 1,
        rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(handler.data['v_100m']), before_v)


def test_lin_bc_monthly(tmp_path):
    """Monthly (12-deep) factors select by each timestep's month —
    the Nov->Dec boundary gets distinct factors."""
    handler = _handler(tmp_path, t=30, start='2019-11-16')
    lat, lon = _coords(handler)
    scalar = np.ones((S, S, 12), np.float32)
    adder = np.zeros((S, S, 12), np.float32)
    adder[..., 10] = 100.0   # November
    adder[..., 11] = -100.0  # December
    fp = str(tmp_path / 'lin_monthly.h5')
    with h5py.File(fp, 'w') as f:
        f.create_dataset('latitude', data=lat)
        f.create_dataset('longitude', data=lon)
        f.create_dataset('u_100m_scalar', data=scalar)
        f.create_dataset('u_100m_adder', data=adder)
    before = np.asarray(handler.data['u_100m']).copy()
    lin_bc(handler, fp)
    after = np.asarray(handler.data['u_100m'])
    months = handler.time_index.month.values
    np.testing.assert_allclose(
        after[..., months == 11], before[..., months == 11] + 100,
        rtol=1e-5)
    np.testing.assert_allclose(
        after[..., months == 12], before[..., months == 12] - 100,
        rtol=1e-5)


def test_lin_bc_bad_depth_raises(tmp_path):
    handler = _handler(tmp_path)
    lat, lon = _coords(handler)
    fp = str(tmp_path / 'bad.h5')
    with h5py.File(fp, 'w') as f:
        f.create_dataset('latitude', data=lat)
        f.create_dataset('longitude', data=lon)
        f.create_dataset('u_100m_scalar',
                         data=np.ones((S, S, 5), np.float32))
        f.create_dataset('u_100m_adder',
                         data=np.zeros((S, S, 5), np.float32))
    with pytest.raises(RuntimeError, match='1 or 12'):
        lin_bc(handler, fp)


def _qdm_file(tmp_path, feature='u_100m'):
    lat = np.linspace(40.0, 39.0, S)[:, None].repeat(S, axis=1)
    lon = np.linspace(-105.5, -104.3, S)[None].repeat(S, axis=0)
    q = sampled_quantiles(NQ) * 100
    row = np.nanpercentile(RNG.normal(10, 2, 3000), q)
    oh = np.broadcast_to(row, (S, S, 1, NQ)).astype(np.float32)
    mh = (oh + 3).astype(np.float32)
    fp = str(tmp_path / 'qdm.h5')
    with h5py.File(fp, 'w') as f:
        f.create_dataset('latitude', data=lat)
        f.create_dataset('longitude', data=lon)
        f.create_dataset('base_ws_params', data=oh)
        f.create_dataset(f'bias_{feature}_params', data=mh)
        f.create_dataset(f'bias_fut_{feature}_params', data=mh)
        f.attrs['cfg'] = json.dumps({
            'time_window_center': [182.5], 'sampling': 'linear',
            'log_base': 10})
    return fp


def test_qdm_bc_matches_local_transform(tmp_path):
    handler = _handler(tmp_path)
    fp = _qdm_file(tmp_path)
    before = np.asarray(handler.data['u_100m']).copy()
    expected = local_qdm_bc(
        before.copy(), np.asarray(handler.lat_lon), 'ws', 'u_100m',
        fp, date_range_kwargs=get_date_range_kwargs(
            handler.time_index), relative=False)
    done = qdm_bc(handler, fp, 'ws', relative=False)
    assert done == ['u_100m']
    np.testing.assert_allclose(np.asarray(handler.data['u_100m']),
                               expected, rtol=1e-6)
    # absolute QDM with mh == mf and oh = mh - 3 removes the offset
    shift = np.nanmean(np.asarray(handler.data['u_100m']) - before)
    assert abs(shift + 3) < 0.3


def test_qdm_bc_skips_features_without_params(tmp_path):
    handler = _handler(tmp_path)
    fp = _qdm_file(tmp_path, feature='u_100m')
    before_v = np.asarray(handler.data['v_100m']).copy()
    done = qdm_bc(handler, fp, 'ws', relative=False)
    assert 'v_100m' not in done
    np.testing.assert_array_equal(
        np.asarray(handler.data['v_100m']), before_v)
