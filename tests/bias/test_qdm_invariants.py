"""Analytic QDM invariants on constructed distributions (mirrors the
reference's identity/offset/trend family, tests/bias/
test_qdm_bias_correction.py:243-455) plus parametric shift/scale
recovery, SkillAssessment stat assertions, a linear-vs-QDM
cross-check, and monthly/window boundary behavior."""

import h5py
import json
import numpy as np
import pandas as pd
import pytest
from scipy import stats

from sup3r_tpu.bias import (
    LinearCorrection,
    SkillAssessment,
    local_linear_bc,
    local_qdm_bc,
    monthly_local_linear_bc,
)
from sup3r_tpu.bias.qdm_math import sampled_quantiles
from sup3r_tpu.utilities.test_helpers import (
    make_fake_h5_file,
    make_fake_nc_file,
)

RNG = np.random.default_rng(7)
S1 = S2 = 3
NQ = 51
NT = 1


def _write_params(fp, oh, mh, mf, sampling='linear', log_base=10):
    """Synthetic QDM factor file; param rasters (S1, S2, NT, NQ)."""
    lat = np.linspace(40.0, 39.0, S1)[:, None].repeat(S2, axis=1)
    lon = np.linspace(-105.5, -104.3, S2)[None].repeat(S1, axis=0)
    with h5py.File(fp, 'w') as f:
        f.create_dataset('latitude', data=lat)
        f.create_dataset('longitude', data=lon)
        f.create_dataset('base_ghi_params', data=oh)
        f.create_dataset('bias_rsds_params', data=mh)
        f.create_dataset('bias_fut_rsds_params', data=mf)
        f.attrs['cfg'] = json.dumps({
            'time_window_center': [182.5] * NT and [182.5],
            'sampling': sampling,
            'log_base': log_base,
        })
    return fp


def _lat_lon():
    lat = np.linspace(40.0, 39.0, S1)[:, None].repeat(S2, axis=1)
    lon = np.linspace(-105.5, -104.3, S2)[None].repeat(S1, axis=0)
    return np.dstack([lat, lon])


def _params_from_samples(samples):
    """Empirical CDF x-values (S1, S2, NT, NQ) from per-gid samples
    broadcast to every gid."""
    q = sampled_quantiles(NQ) * 100
    row = np.nanpercentile(samples, q)
    return np.broadcast_to(
        row, (S1, S2, NT, NQ)).astype(np.float32).copy()


def _date_kwargs(n, freq='h'):
    ti = pd.date_range('2018-02-01', periods=n, freq=freq)
    return {'start': str(ti[0]), 'end': str(ti[-1]), 'freq': freq}


def _apply(data, fp, **kwargs):
    return local_qdm_bc(
        data, _lat_lon(), 'ghi', 'rsds', fp,
        date_range_kwargs=_date_kwargs(data.shape[-1]), **kwargs)


@pytest.mark.parametrize('relative', [True, False])
def test_bc_identity(tmp_path, relative):
    """oh == mh == mf -> the transform is the identity (reference:
    test_bc_identity / test_bc_identity_absolute)."""
    base = RNG.normal(10, 3, 5000)
    p = _params_from_samples(base)
    fp = _write_params(str(tmp_path / 'p.h5'), p, p, p)
    data = RNG.normal(10, 3, (S1, S2, 200)).astype(np.float32)
    out = _apply(data, fp, relative=relative)
    np.testing.assert_allclose(out, data, rtol=1e-5, atol=1e-4)


def test_bc_model_constant(tmp_path):
    """Constant model, biased history: the historical offset is
    removed from the future (reference: test_bc_model_constant)."""
    base = RNG.normal(50, 5, 5000)
    mf = _params_from_samples(base)
    fp = _write_params(str(tmp_path / 'p.h5'), mf - 10, mf, mf)
    data = RNG.normal(50, 5, (S1, S2, 300)).astype(np.float32)
    out = _apply(data, fp, relative=False)
    np.testing.assert_allclose(out - data, -10, rtol=1e-4, atol=1e-3)


def test_bc_trend(tmp_path):
    """No historical bias, +10 model trend: trust the forecast trend
    (reference: test_bc_trend)."""
    base = RNG.normal(50, 5, 5000)
    mf = _params_from_samples(base)
    fp = _write_params(str(tmp_path / 'p.h5'), mf, mf - 10, mf)
    data = RNG.normal(50, 5, (S1, S2, 300)).astype(np.float32)
    out = _apply(data, fp, relative=False)
    np.testing.assert_allclose(out - data, 10, rtol=1e-4, atol=1e-3)


def test_bc_trend_same_hist(tmp_path):
    """Same offset in obs and model history -> identity (reference:
    test_bc_trend_same_hist)."""
    base = RNG.normal(50, 5, 5000)
    mf = _params_from_samples(base)
    fp = _write_params(str(tmp_path / 'p.h5'), mf - 10, mf - 10, mf)
    data = RNG.normal(50, 5, (S1, S2, 300)).astype(np.float32)
    out = _apply(data, fp, relative=False)
    np.testing.assert_allclose(out, data, rtol=1e-4, atol=1e-3)


def test_bc_relative_scale(tmp_path):
    """Relative QDM: obs = 2x model-history -> outputs double."""
    base = RNG.normal(50, 5, 5000)
    mf = _params_from_samples(base)
    fp = _write_params(str(tmp_path / 'p.h5'), 2 * mf, mf, mf)
    data = RNG.normal(50, 5, (S1, S2, 300)).astype(np.float32)
    out = _apply(data, fp, relative=True)
    np.testing.assert_allclose(out, 2 * data, rtol=1e-4)


def test_no_trend_equals_mf_eq_mh(tmp_path):
    """no_trend=True == a param file with mf := mh (reference:
    test_qdm_transform_notrend)."""
    oh = _params_from_samples(RNG.normal(8, 2, 4000))
    mh = _params_from_samples(RNG.normal(12, 3, 4000))
    mf = _params_from_samples(RNG.normal(14, 3, 4000))
    fp1 = _write_params(str(tmp_path / 'p1.h5'), oh, mh, mf)
    fp2 = _write_params(str(tmp_path / 'p2.h5'), oh, mh, mh)
    data = RNG.normal(12, 3, (S1, S2, 200)).astype(np.float32)
    out1 = _apply(data, fp1, no_trend=True)
    out2 = _apply(data, fp2)
    np.testing.assert_allclose(out1, out2, rtol=1e-5, equal_nan=True)


@pytest.mark.parametrize('sampling', ['linear', 'invlog', 'log'])
def test_shift_scale_recovery(tmp_path, sampling):
    """QDM on a known shifted/scaled bias recovers the observed
    distribution: obs ~ N(10, 2); model-hist = 2*obs - 5; future adds
    a +3 trend. Corrected future must match N(10, 2) + 3 in mean,
    spread, and KS distance."""
    n = 6000
    obs = RNG.normal(10, 2, n)
    mh_samples = 2 * RNG.normal(10, 2, n) - 5
    mf_samples = 2 * RNG.normal(10, 2, n) - 5 + 3
    q = sampled_quantiles(NQ, sampling) * 100

    def params(samples):
        row = np.nanpercentile(samples, q)
        return np.broadcast_to(
            row, (S1, S2, NT, NQ)).astype(np.float32).copy()

    fp = _write_params(str(tmp_path / 'p.h5'), params(obs),
                       params(mh_samples), params(mf_samples),
                       sampling=sampling)
    fut = (2 * RNG.normal(10, 2, (S1, S2, 2000)) - 2).astype(
        np.float32)
    out = _apply(fut, fp, relative=False)
    # closed form: with z = (x - 18)/4, out = oh(tau) + x - mh(tau)
    #            = (10 + 2z) + x - (15 + 4z) = x/2 + 4  ~  N(13, 2):
    # the x2 scale bias is removed (std 4 -> 2) and the +3 model
    # trend lands as +3/2 on the observed scale
    assert abs(out.mean() - 13.0) < 0.15, out.mean()
    assert abs(out.std() - 2.0) < 0.15, out.std()
    # KS distance to a fresh N(13, 2) sample is small
    ref = RNG.normal(13, 2, out.size)
    ks = stats.ks_2samp(out.ravel(), ref)
    assert ks.statistic < 0.05, ks


@pytest.fixture
def shifted_pair(tmp_path):
    """Base h5 + biased nc where bias = base-distribution + 5 (known
    additive bias) on matching grids."""
    base_fp = make_fake_h5_file(
        str(tmp_path / 'base.h5'), (10, 10, 2000), ['windspeed_100m'],
        freq='h', value_range=(5, 15),
        lat_range=(40.0, 39.0), lon_range=(-105.5, -104.3))
    bias_fp = make_fake_nc_file(
        str(tmp_path / 'bias.nc'), (5, 5, 400), ['u100'], freq='D',
        lat_range=(40.0, 39.0), lon_range=(-105.5, -104.3))
    # overwrite the nc values with a shifted copy of the base range
    from scipy.io import netcdf_file

    with netcdf_file(bias_fp, 'a', mmap=False) as f:
        shape = f.variables['u100'].shape
        f.variables['u100'][:] = (
            5 + 10 * RNG.random(shape) + 5).astype(np.float32)
    return base_fp, bias_fp


def test_skill_assessment_stats(shifted_pair):
    """SkillAssessment on a constructed +5 additive bias: bias stat
    ~= +5, KS stat large with tiny p-value, percentiles ordered and
    offset by ~5 (reference: test_skill_assessment +
    test_bias_correction.py:616-661)."""
    base_fp, bias_fp = shifted_pair
    calc = SkillAssessment(base_fp, bias_fp, 'windspeed_100m',
                           'u_100m')
    out = calc.run(fill_extend=False)
    bias_stat = out['u_100m_bias']
    finite = bias_stat[np.isfinite(bias_stat)]
    assert finite.size > 0
    assert abs(np.mean(finite) - 5.0) < 0.5
    ks = out['u_100m_ks_stat'][np.isfinite(out['u_100m_ks_stat'])]
    ksp = out['u_100m_ks_p'][np.isfinite(out['u_100m_ks_p'])]
    assert (ks > 0.5).all()      # distributions clearly shifted
    assert (ksp < 1e-3).all()
    for lo, hi in [(1, 50), (50, 99)]:
        plo = out[f'bias_u_100m_percentile_{lo}']
        phi = out[f'bias_u_100m_percentile_{hi}']
        ok = np.isfinite(plo) & np.isfinite(phi)
        assert (plo[ok] <= phi[ok]).all()
    # median offset ~ +5
    p50b = out['bias_u_100m_percentile_50']
    p50o = out['base_windspeed_100m_percentile_50']
    ok = np.isfinite(p50b) & np.isfinite(p50o)
    assert abs(np.mean(p50b[ok] - p50o[ok]) - 5.0) < 0.6


def test_linear_vs_qdm_cross_check(shifted_pair, tmp_path):
    """Linear correction and QDM, calibrated on the same pair, both
    map the biased series back onto the (daily-reduced, neighbor-
    aggregated) base distribution — their corrected outputs agree in
    mean and spread, and both land on the base mean."""
    from sup3r_tpu.preprocessing.data_handlers import DataHandler

    base_fp, bias_fp = shifted_pair
    lin = LinearCorrection(base_fp, bias_fp, 'windspeed_100m',
                           'u_100m')
    fp_lin = str(tmp_path / 'lin.h5')
    lin.run(fp_out=fp_lin, fill_extend=True)
    base_mean = np.nanmean(np.concatenate([
        lin.get_base_data(g, daily_reduction='avg')[0]
        for g in range(0, lin.bias_gid_raster.size, 7)]))

    from sup3r_tpu.bias import QuantileDeltaMappingCorrection

    qdm = QuantileDeltaMappingCorrection(
        base_fp, bias_fp, bias_fp, 'windspeed_100m', 'u_100m',
        n_quantiles=21, n_time_steps=1)
    fp_qdm = str(tmp_path / 'qdm.h5')
    qdm.run(fp_out=fp_qdm, fill_extend=True)

    dh = DataHandler(bias_fp, features=['u_100m'])
    data = np.asarray(dh.data['u_100m'], dtype=np.float32)
    lat_lon = np.asarray(dh.lat_lon)
    ti = dh.time_index
    kw = {'start': str(ti[0]), 'end': str(ti[-1]), 'freq': 'D'}
    out_lin = local_linear_bc(data.copy(), lat_lon, 'u_100m', fp_lin,
                              out_range=None)
    out_qdm = local_qdm_bc(data.copy(), lat_lon, 'windspeed_100m',
                           'u_100m', fp_qdm, date_range_kwargs=kw)
    # both land on the base distribution's mean...
    assert abs(np.nanmean(out_lin) - base_mean) < 0.4
    assert abs(np.nanmean(out_qdm) - base_mean) < 0.4
    # ...and agree with each other in mean and spread
    assert abs(np.nanmean(out_lin) - np.nanmean(out_qdm)) < 0.3
    s_lin, s_qdm = np.nanstd(out_lin), np.nanstd(out_qdm)
    assert abs(s_lin / s_qdm - 1) < 0.25, (s_lin, s_qdm)


def test_monthly_boundary_months(tmp_path):
    """Monthly factors apply by calendar month across a Dec->Jan
    boundary: December values use the Dec factor, January the Jan
    factor (reference: monthly window edge cases,
    test_bias_correction.py:225-284)."""
    s1 = s2 = 2
    lat = np.linspace(40.0, 39.0, s1)[:, None].repeat(s2, axis=1)
    lon = np.linspace(-105.5, -104.3, s2)[None].repeat(s1, axis=0)
    scalar = np.ones((s1, s2, 12), np.float32)
    adder = np.zeros((s1, s2, 12), np.float32)
    adder[..., 11] = 100.0   # December
    adder[..., 0] = -100.0   # January
    fp = str(tmp_path / 'monthly.h5')
    with h5py.File(fp, 'w') as f:
        f.create_dataset('latitude', data=lat)
        f.create_dataset('longitude', data=lon)
        f.create_dataset('u_100m_scalar', data=scalar)
        f.create_dataset('u_100m_adder', data=adder)
        f.attrs['cfg'] = json.dumps({'time_window_center': []})
    ti = pd.date_range('2020-12-30', '2021-01-02 23:00', freq='h')
    data = np.zeros((s1, s2, ti.size), np.float32)
    out = monthly_local_linear_bc(
        data, np.dstack([lat, lon]), 'u_100m', fp,
        date_range_kwargs={'start': str(ti[0]), 'end': str(ti[-1]),
                           'freq': 'h'}, temporal_avg=False)
    dec = ti.month == 12
    jan = ti.month == 1
    assert np.allclose(out[:, :, dec], 100.0)
    assert np.allclose(out[:, :, jan], -100.0)


def test_fill_nan_and_save_file(shifted_pair, tmp_path):
    """Gids outside the baseline's coverage leave NaN params without
    fill_extend; fill_extend fills them; the saved H5 round-trips
    with coordinates and cfg attrs (reference:
    test_qdm_bias_correction.py:186-242)."""
    from sup3r_tpu.bias import QuantileDeltaMappingCorrection

    base_fp, bias_fp = shifted_pair
    calc = QuantileDeltaMappingCorrection(
        base_fp, bias_fp, bias_fp, 'windspeed_100m', 'u_100m',
        n_quantiles=11, n_time_steps=1,
        distance_upper_bound=0.03)  # tiny: most gids lose coverage
    out = calc.run(fill_extend=False)
    params = [k for k in out if k.endswith('params')]
    assert params
    assert all(np.isnan(out[k]).any() for k in params), (
        'need at least one uncovered gid for this test to bite')

    fp_out = str(tmp_path / 'qdm_filled.h5')
    calc2 = QuantileDeltaMappingCorrection(
        base_fp, bias_fp, bias_fp, 'windspeed_100m', 'u_100m',
        n_quantiles=11, n_time_steps=1, distance_upper_bound=0.03)
    out2 = calc2.run(fp_out=fp_out)
    assert all(np.isfinite(out2[k]).all() for k in out2)
    with h5py.File(fp_out, 'r') as f:
        assert 'latitude' in f and 'longitude' in f
        for k in params:
            assert k in f
            assert np.isfinite(f[k][...]).all()
        cfg = json.loads(f.attrs['cfg'])
        assert 'time_window_center' in cfg
        assert cfg['n_quantiles'] == 11


def test_window_mask_even_window_size():
    """Even window sizes center correctly (reference:
    test_qdm_bias_correction.py:61-66)."""
    from sup3r_tpu.bias.transforms import window_mask

    doy = np.arange(1, 366)
    idx = window_mask(doy, 180, 10)
    assert doy[idx].min() >= 175 and doy[idx].max() <= 185
    assert idx.sum() in (9, 10)  # exclusive bounds
    # wrap at the start of year
    idx0 = window_mask(doy, 2, 10)
    got = set(doy[idx0])
    assert {1, 2, 3} <= got
    assert {363, 364, 365} & got  # wrapped tail


def test_clearsky_ratio_linear_bc(tmp_path):
    """Linear correction on clearsky_ratio with NaN night values:
    NaNs must not poison the factors (reference:
    test_bias_correction.py:419-452)."""
    from sup3r_tpu.bias import LinearCorrection
    from sup3r_tpu.utilities.test_helpers import make_fake_h5_file

    base_fp = make_fake_h5_file(
        str(tmp_path / 'base_cs.h5'), (10, 10, 500),
        ['clearsky_ratio'], freq='h', value_range=(0.3, 1.0),
        scale_factor=10000,
        lat_range=(40.0, 39.0), lon_range=(-105.5, -104.3))
    bias_fp = make_fake_nc_file(
        str(tmp_path / 'bias_cs.nc'), (5, 5, 100),
        ['clearsky_ratio'], freq='D',
        lat_range=(40.0, 39.0), lon_range=(-105.5, -104.3))
    # inject NaNs (night) into the biased data
    from scipy.io import netcdf_file

    with netcdf_file(bias_fp, 'a', mmap=False) as f:
        arr = np.array(f.variables['clearsky_ratio'][:])
        arr[::7] = np.nan
        f.variables['clearsky_ratio'][:] = arr
    calc = LinearCorrection(base_fp, bias_fp, 'clearsky_ratio',
                            'clearsky_ratio')
    out = calc.run(fill_extend=True)
    scalar = out['clearsky_ratio_scalar']
    adder = out['clearsky_ratio_adder']
    assert np.isfinite(scalar).all() and np.isfinite(adder).all()
    # factors are sane for a [0.3, 1] field
    assert np.abs(adder).max() < 2
    assert (scalar > 0).all()
