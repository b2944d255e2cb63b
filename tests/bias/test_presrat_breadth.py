"""PresRat invariants (mirrors reference
tests/bias/test_presrat_bias_correction.py:426-740): zero-rate edge
cases, output ranges, threshold extremes, dry-day preservation through
the runtime transform, no-trend identity, and QDM-vs-PresRat
divergence on precipitation."""

import numpy as np
import pandas as pd
import pytest

from sup3r_tpu.bias import (
    PresRat,
    QuantileDeltaMappingCorrection,
    local_presrat_bc,
    local_qdm_bc,
)
from sup3r_tpu.bias.presrat import zero_precipitation_rate
from sup3r_tpu.bias.transforms import get_date_range_kwargs
from sup3r_tpu.utilities.test_helpers import (
    make_fake_h5_file,
    make_fake_nc_file,
)

RNG = np.random.default_rng(3)


def test_zero_precipitation_rate():
    arr = np.array([0.0, 0.0, 1.0, 2.0])
    assert zero_precipitation_rate(arr, threshold=0.5) == 0.5


def test_zero_precipitation_rate_extremes():
    arr = np.arange(10, dtype=float)
    assert zero_precipitation_rate(arr, threshold=-1) == 0
    assert zero_precipitation_rate(arr, threshold=0.5) == 0.1
    assert zero_precipitation_rate(arr, threshold=100) == 1
    assert zero_precipitation_rate(arr, threshold=9.5) == 1


def test_zero_precipitation_rate_nanonly():
    assert np.isnan(zero_precipitation_rate(
        np.full(5, np.nan), threshold=1))


def test_zero_precipitation_rate_nan_robust():
    """NaNs are ignored, not counted."""
    arr = np.arange(10, dtype=float)
    with_nan = np.concatenate([arr, [np.nan, np.nan]])
    r1 = zero_precipitation_rate(arr, threshold=5)
    r2 = zero_precipitation_rate(with_nan, threshold=5)
    assert r1 == r2


@pytest.fixture
def presrat_files(tmp_path):
    base_fp = make_fake_h5_file(
        str(tmp_path / 'base.h5'), (10, 10, 24 * 200), ['pr'],
        freq='h', value_range=(0, 5e-4), scale_factor=1e7,
        lat_range=(40.0, 39.0), lon_range=(-105.5, -104.3))
    bias_fp = make_fake_nc_file(
        str(tmp_path / 'hist.nc'), (5, 5, 200), ['pr'], freq='D',
        lat_range=(40.0, 39.0), lon_range=(-105.5, -104.3))
    fut_fp = make_fake_nc_file(
        str(tmp_path / 'fut.nc'), (5, 5, 200), ['pr'], freq='D',
        lat_range=(40.0, 39.0), lon_range=(-105.5, -104.3))
    return base_fp, bias_fp, fut_fp


def test_presrat_output_ranges(presrat_files, tmp_path):
    """Every PresRat output exists, is finite after fill, zero rates
    live in [0, 1], K factors are positive (reference:
    test_presrat_bias_correction.py:481-520)."""
    base_fp, bias_fp, fut_fp = presrat_files
    calc = PresRat(base_fp, bias_fp, fut_fp, 'pr', 'pr',
                   n_quantiles=11, n_time_steps=2,
                   zero_rate_threshold=1e-5)
    out = calc.run()
    expected = ['base_pr_params', 'bias_pr_params',
                'bias_fut_pr_params', 'pr_tau_fut', 'pr_k_factor',
                'pr_zero_rate']
    for v in expected:
        assert v in out, f'Missing {v}'
        assert np.all(np.isfinite(out[v])), f'Non-finite {v}'
    zr = out['pr_zero_rate']
    assert np.all((zr >= 0) & (zr <= 1))
    assert np.all(out['pr_k_factor'] > 0)


def test_presrat_threaded_matches_serial(presrat_files):
    """max_workers=4 produces the same rasters as serial (reference:
    test_presrat_bias_correction.py:523-557)."""
    base_fp, bias_fp, fut_fp = presrat_files
    kw = dict(n_quantiles=11, n_time_steps=2,
              zero_rate_threshold=1e-5)
    out_s = PresRat(base_fp, bias_fp, fut_fp, 'pr', 'pr', **kw).run(
        max_workers=1, fill_extend=False)
    out_p = PresRat(base_fp, bias_fp, fut_fp, 'pr', 'pr', **kw).run(
        max_workers=4, fill_extend=False)
    for k in out_s:
        np.testing.assert_allclose(out_p[k], out_s[k], equal_nan=True)


def test_presrat_zero_rate_thresholds(presrat_files):
    """threshold=0 -> rate 0 everywhere (nothing strictly below 0);
    huge threshold -> rate 1 (reference:
    test_presrat_bias_correction.py:562-594)."""
    base_fp, bias_fp, fut_fp = presrat_files
    kw = dict(n_quantiles=11, n_time_steps=2)
    out0 = PresRat(base_fp, bias_fp, fut_fp, 'pr', 'pr',
                   zero_rate_threshold=0.0, **kw).run(
        fill_extend=False)
    assert np.all(out0['pr_zero_rate'][np.isfinite(
        out0['pr_zero_rate'])] == 0)
    out1 = PresRat(base_fp, bias_fp, fut_fp, 'pr', 'pr',
                   zero_rate_threshold=1e4, **kw).run(
        fill_extend=False)
    assert np.all(out1['pr_zero_rate'][np.isfinite(
        out1['pr_zero_rate'])] == 1)


def test_presrat_transform_dry_days(presrat_files, tmp_path):
    """The runtime transform changes the data and never DECREASES the
    number of dry values (tau thresholding zeroes the drizzle;
    reference: test_presrat_bias_correction.py:600-631)."""
    base_fp, bias_fp, fut_fp = presrat_files
    calc = PresRat(base_fp, bias_fp, fut_fp, 'pr', 'pr',
                   n_quantiles=11, n_time_steps=2,
                   zero_rate_threshold=1e-5)
    fp_out = str(tmp_path / 'presrat.h5')
    calc.run(fp_out=fp_out)

    lat = np.linspace(40.0, 39.0, 5)
    lon = np.linspace(-105.5, -104.3, 5)
    lat_lon = np.dstack(np.meshgrid(lat, lon, indexing='ij'))
    data = (5e-4 * RNG.random((5, 5, 60))).astype(np.float32)
    ti = pd.date_range('2050-01-01', periods=60, freq='D')
    corrected = local_presrat_bc(
        data, lat_lon, 'pr', 'pr', fp_out, get_date_range_kwargs(ti))
    assert np.isfinite(corrected).any()
    assert not np.allclose(data, corrected)
    n_zero_in = int((data <= 1e-5).sum())
    n_zero_out = int((corrected <= 1e-5).sum())
    assert n_zero_out >= n_zero_in


def test_presrat_no_trend_is_nearly_identity(tmp_path):
    """When historical and future biased data share the distribution
    of the baseline, the correction is close to identity (reference
    'nochanges' case, test_presrat_bias_correction.py:633-667)."""
    # one shared distribution for base/bias/fut
    vals = (1e-3 * RNG.random((12, 12, 24 * 200))).astype(np.float32)
    base_fp = make_fake_h5_file(
        str(tmp_path / 'base.h5'), (12, 12, 24 * 200), ['pr'],
        freq='h', value_range=(0, 1e-3), scale_factor=1e7,
        lat_range=(40.0, 39.0), lon_range=(-105.5, -104.3))
    bias_fp = make_fake_nc_file(
        str(tmp_path / 'hist.nc'), (6, 6, 400), ['pr'], freq='D',
        lat_range=(40.0, 39.0), lon_range=(-105.5, -104.3))
    # future == historical file (identical distribution, no trend)
    calc = PresRat(base_fp, bias_fp, bias_fp, 'pr', 'pr',
                   n_quantiles=21, n_time_steps=2,
                   zero_rate_threshold=0.0)
    out = calc.run(fill_extend=False)
    k = out['pr_k_factor']
    finite = k[np.isfinite(k)]
    # no trend: K factors near 1
    np.testing.assert_allclose(finite, 1.0, atol=0.2)
    # hist == fut: the mh and mf CDFs are identical
    np.testing.assert_allclose(
        out['bias_pr_params'], out['bias_fut_pr_params'],
        equal_nan=True, rtol=1e-6)


def test_qdm_vs_presrat_differ(presrat_files, tmp_path):
    """PresRat (tau + K) must diverge from plain QDM on the same data
    (reference: test_presrat_bias_correction.py:701-737)."""
    base_fp, bias_fp, fut_fp = presrat_files
    qdm_fp = str(tmp_path / 'qdm.h5')
    pr_fp = str(tmp_path / 'presrat.h5')
    QuantileDeltaMappingCorrection(
        base_fp, bias_fp, fut_fp, 'pr', 'pr', n_quantiles=11,
        n_time_steps=2).run(fp_out=qdm_fp)
    PresRat(base_fp, bias_fp, fut_fp, 'pr', 'pr', n_quantiles=11,
            n_time_steps=2, zero_rate_threshold=1e-5).run(fp_out=pr_fp)

    lat = np.linspace(40.0, 39.0, 5)
    lon = np.linspace(-105.5, -104.3, 5)
    lat_lon = np.dstack(np.meshgrid(lat, lon, indexing='ij'))
    data = (5e-4 * RNG.random((5, 5, 60))).astype(np.float32)
    ti = pd.date_range('2050-01-01', periods=60, freq='D')
    kwargs = get_date_range_kwargs(ti)
    a = local_qdm_bc(data, lat_lon, 'pr', 'pr', qdm_fp, kwargs)
    b = local_presrat_bc(data, lat_lon, 'pr', 'pr', pr_fp, kwargs)
    assert not np.allclose(a, b)


def test_match_zero_rate_linear_correction(tmp_path):
    """match_zero_rate=True zeroes the drizzle tail of the biased data
    before computing factors (Polade 2014; reference:
    sup3r/bias/base.py:557-599 + bias_calc.py:123)."""
    from sup3r_tpu.bias import ScalarCorrection
    from sup3r_tpu.bias.base import DataRetrievalBase

    # unit check of the static helper: base has 40% zeros
    base = np.concatenate([np.zeros(40), RNG.random(60) + 0.5])
    bias = RNG.random(100) + 0.01  # no zeros at all
    matched = DataRetrievalBase._match_zero_rate(bias.copy(), base)
    rate = float((matched == 0).mean())
    assert abs(rate - 0.4) < 0.05
    # values above the cut survive unchanged (float32 cast aside)
    survivors = np.sort(matched[matched > 0])
    expected = np.sort(bias)[len(bias) - len(survivors):]
    np.testing.assert_allclose(survivors, expected, rtol=1e-6)

    # end-to-end: factors differ when matching is on. Give the BASE
    # data a real dry fraction (50% zeros) so the zero-rate transfer
    # actually zeroes bias values.
    import h5py

    base_fp = make_fake_h5_file(
        str(tmp_path / 'base.h5'), (10, 10, 500), ['pr'],
        freq='h', value_range=(0, 5e-4), scale_factor=1e7,
        lat_range=(40.0, 39.0), lon_range=(-105.5, -104.3))
    with h5py.File(base_fp, 'r+') as f:
        packed = f['pr'][:]
        # zero out whole DAYS (the gid stats use daily means) at
        # every site so the daily zero rate is ~40%
        n_days = packed.shape[0] // 24
        dry_days = RNG.random(n_days) < 0.4
        for d in np.flatnonzero(dry_days):
            packed[d * 24:(d + 1) * 24, :] = 0
        f['pr'][...] = packed
    bias_fp = make_fake_nc_file(
        str(tmp_path / 'hist.nc'), (5, 5, 500), ['pr'], freq='h',
        lat_range=(40.0, 39.0), lon_range=(-105.5, -104.3))
    out_plain = ScalarCorrection(base_fp, bias_fp, 'pr', 'pr').run(
        fill_extend=False)
    out_zr = ScalarCorrection(base_fp, bias_fp, 'pr', 'pr',
                              match_zero_rate=True).run(
        fill_extend=False)
    k = 'pr_scalar'
    a, b = out_plain[k], out_zr[k]
    finite = np.isfinite(a) & np.isfinite(b)
    assert not np.allclose(a[finite], b[finite])


def test_nc_base_file(tmp_path):
    """Gridded NC files serve as the baseline 'observations' via the
    flat-API adapter (reference:
    tests/bias/test_bias_correction.py:662-710)."""
    from sup3r_tpu.bias import ScalarCorrection

    base_fp = make_fake_nc_file(
        str(tmp_path / 'base.nc'), (12, 12, 200), ['u_100m'],
        freq='D', lat_range=(40.0, 39.0), lon_range=(-105.5, -104.3))
    bias_fp = make_fake_nc_file(
        str(tmp_path / 'bias.nc'), (6, 6, 200), ['u_100m'], freq='D',
        lat_range=(40.0, 39.0), lon_range=(-105.5, -104.3))
    calc = ScalarCorrection(base_fp, bias_fp, 'u_100m', 'u_100m',
                            base_handler='LoaderNC')
    out = calc.run(fill_extend=True, daily_reduction=None)
    key = 'u_100m_scalar'
    assert key in out
    assert np.isfinite(out[key]).all()
    assert out[key].shape[:2] == (6, 6)
    assert (out[key] > 0).all()


def test_fill_and_smooth_semantics(tmp_path):
    """fill_extend fills NaN gids from neighbors; smooth_interior
    relaxes inland variance (reference:
    tests/bias/test_bias_correction.py:38-95)."""
    from sup3r_tpu.bias.bias_calc import FillAndSmoothMixin

    class _T(FillAndSmoothMixin):
        pass

    rng = np.random.default_rng(0)
    arr = rng.random((8, 8, 1)).astype(np.float32)
    arr[2:4, 2:4, :] = np.nan
    filled = _T().fill_and_smooth({'k': arr.copy()},
                                  fill_extend=True)['k']
    assert not np.isnan(filled).any()
    # untouched entries preserved
    keep = ~np.isnan(arr)
    np.testing.assert_allclose(filled[keep], arr[keep])

    smoothed = _T().fill_and_smooth(
        {'k': arr.copy()}, fill_extend=True, smooth_interior=1.0)['k']
    assert not np.isnan(smoothed).any()
    assert smoothed[:, :, 0].var() < filled[:, :, 0].var()


def test_zero_rate_inclusive_threshold():
    """<= semantics (reference code: mixins.py:160): exact threshold
    hits count as dry."""
    arr = np.array([0.0, 0.5, 1.0, 2.0])
    assert zero_precipitation_rate(arr, threshold=0.5) == 0.5
    assert zero_precipitation_rate(arr, threshold=0.0) == 0.25


def test_k_factor_clamped_in_dry_windows(presrat_files):
    """All four window means clamp to >= zero_rate_threshold before K
    (reference: presrat.py:241-244) — a near-zero mh cannot blow K
    up."""
    base_fp, bias_fp, fut_fp = presrat_files
    calc = PresRat(base_fp, bias_fp, fut_fp, 'pr', 'pr',
                   n_quantiles=11, n_time_steps=2,
                   zero_rate_threshold=1e-3)
    # synthetic per-gid inputs: bias history ~1e-9 (dry)
    t = 200
    ti = pd.date_range('2015-01-01', periods=t, freq='D')
    base = np.full(t, 2e-3, np.float32)
    bias = np.full(t, 1e-9, np.float32)
    fut = np.full(t, 2e-3, np.float32)
    corr = np.full(t, 2e-3, np.float32)
    k = calc.calc_k_factor(base, bias, fut, corr, ti, ti, ti)
    finite = k[np.isfinite(k)]
    assert finite.size
    # unclamped K would be (2e-3 * 2e-3) / (2e-3 * 1e-9) = 2e6;
    # clamped mh >= 1e-3 bounds it at (2e-3 * 2e-3)/(2e-3 * 1e-3) = 2
    assert (finite <= 2.01).all(), finite


def test_zero_rate_key_uses_base_dset(tmp_path):
    """Output schema parity: the zero-rate raster is keyed by the
    BASE dset (reference: presrat.py:84)."""
    base_fp = make_fake_h5_file(
        str(tmp_path / 'base_ghi.h5'), (10, 10, 24 * 100), ['ghi'],
        freq='h', value_range=(0, 1000), scale_factor=10,
        lat_range=(40.0, 39.0), lon_range=(-105.5, -104.3))
    bias_fp = make_fake_nc_file(
        str(tmp_path / 'hist_rsds.nc'), (5, 5, 100), ['rsds'],
        freq='D', lat_range=(40.0, 39.0), lon_range=(-105.5, -104.3))
    fut_fp = make_fake_nc_file(
        str(tmp_path / 'fut_rsds.nc'), (5, 5, 100), ['rsds'],
        freq='D', lat_range=(40.0, 39.0), lon_range=(-105.5, -104.3))
    calc = PresRat(base_fp, bias_fp, fut_fp, 'ghi', 'rsds',
                   n_quantiles=5, n_time_steps=1)
    out = calc.run(fill_extend=False)
    assert 'ghi_zero_rate' in out
    assert 'rsds_zero_rate' not in out
    assert 'rsds_tau_fut' in out and 'rsds_k_factor' in out


def test_presrat_bc_defaults_denom_min_from_file(presrat_files,
                                                 tmp_path):
    """local_presrat_bc defaults delta_denom_min to the file's
    zero_rate_threshold attr (reference: bias_transforms.py:1073) —
    dry-quantile denominators cannot explode the relative delta."""
    base_fp, bias_fp, fut_fp = presrat_files
    fp_out = str(tmp_path / 'presrat.h5')
    thr = 1e-4
    PresRat(base_fp, bias_fp, fut_fp, 'pr', 'pr', n_quantiles=11,
            n_time_steps=2, zero_rate_threshold=thr).run(
        fp_out=fp_out)
    from sup3r_tpu.preprocessing.data_handlers import DataHandler

    dh = DataHandler(fut_fp, features=['pr'])
    data = np.asarray(dh.data['pr'], np.float32)
    ti = dh.time_index
    kw = {'start': str(ti[0]), 'end': str(ti[-1]), 'freq': 'D'}
    default = local_presrat_bc(
        data.copy(), np.asarray(dh.lat_lon), 'pr', 'pr', fp_out,
        date_range_kwargs=kw)
    explicit = local_presrat_bc(
        data.copy(), np.asarray(dh.lat_lon), 'pr', 'pr', fp_out,
        date_range_kwargs=kw, delta_denom_min=thr)
    np.testing.assert_allclose(default, explicit, equal_nan=True)
