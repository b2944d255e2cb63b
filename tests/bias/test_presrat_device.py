"""Batched / device PresRat parity: the vectorized all-gid ``run()``
must reproduce the per-gid math (reconstructed from the retained
per-gid helpers) and the device path must match the host path
(reference per-gid loop: sup3r/bias/presrat.py:96-253,
bias_calc.py:191-255; SURVEY §2.7 per-gid parallelism row)."""

import numpy as np
import pytest

from sup3r_tpu.bias import PresRat
from sup3r_tpu.utilities.test_helpers import (
    make_fake_h5_file,
    make_fake_nc_file,
)

KW = dict(n_quantiles=11, n_time_steps=4, zero_rate_threshold=1e-5)


@pytest.fixture
def presrat_files(tmp_path):
    base_fp = make_fake_h5_file(
        str(tmp_path / 'base.h5'), (10, 10, 24 * 220), ['pr'],
        freq='h', value_range=(0, 5e-4), scale_factor=1e7,
        lat_range=(40.0, 39.0), lon_range=(-105.5, -104.3))
    bias_fp = make_fake_nc_file(
        str(tmp_path / 'hist.nc'), (5, 5, 220), ['pr'], freq='D',
        lat_range=(40.0, 39.0), lon_range=(-105.5, -104.3))
    fut_fp = make_fake_nc_file(
        str(tmp_path / 'fut.nc'), (5, 5, 220), ['pr'], freq='D',
        lat_range=(40.0, 39.0), lon_range=(-105.5, -104.3))
    return base_fp, bias_fp, fut_fp


def _per_gid_expected(calc, daily_reduction='avg'):
    """The pre-batching per-gid algorithm, reconstructed from the
    retained per-gid helpers."""
    out = calc._init_out()
    bias_ti = calc.bias_time_index
    fut_ti = calc.bias_fut_dh.time_index
    for bias_gid in range(calc.bias_gid_raster.size):
        base_data, base_ti = calc.get_base_data(
            bias_gid, daily_reduction=daily_reduction)
        if base_data is None:
            continue
        bias_data = calc.get_bias_data(bias_gid)
        fut_data = calc.get_bias_fut_data(bias_gid)
        single = calc._windowed_params(
            bias_data, fut_data, base_data, bias_ti, fut_ti, base_ti)
        corrected = calc._correct_fut(
            bias_data, fut_data, base_data, bias_ti, fut_ti, base_ti)
        valid = np.isfinite(corrected)
        tau_fut, zero_rate = calc.calc_tau_fut(
            base_data, bias_data, fut_data[valid], corrected[valid],
            calc.zero_rate_threshold)
        k = calc.calc_k_factor(base_data, bias_data, fut_data,
                               corrected, base_ti, bias_ti, fut_ti)
        row, col = np.unravel_index(bias_gid,
                                    calc.bias_gid_raster.shape)
        for key, v in single.items():
            out[key][row, col] = v
        out[f'{calc.bias_feature}_tau_fut'][row, col, 0] = tau_fut
        out[f'{calc.bias_feature}_k_factor'][row, col] = k
        out[f'{calc.bias_feature}_zero_rate'][row, col, 0] = zero_rate
    return out


def test_batched_matches_per_gid(presrat_files):
    """run(use_device=False) == the per-gid algorithm: params, zero
    rates, and K bit-for-bit; tau_fut at fp32 tolerance (the batched
    correction consumes the float32 param rasters that are written to
    H5 — self-consistent with the runtime transform — where the
    per-gid loop recomputed float64 percentiles)."""
    base_fp, bias_fp, fut_fp = presrat_files
    calc = PresRat(base_fp, bias_fp, fut_fp, 'pr', 'pr', **KW)
    expected = _per_gid_expected(calc)
    got = calc.run(fill_extend=False, use_device=False)
    assert set(got) == set(expected)
    for key in expected:
        if key.endswith(('_tau_fut', '_k_factor')):
            np.testing.assert_allclose(got[key], expected[key],
                                       rtol=1e-5, equal_nan=True,
                                       err_msg=key)
        else:
            np.testing.assert_array_equal(got[key], expected[key],
                                          err_msg=key)


def test_device_matches_host(presrat_files):
    """run(use_device=True) matches the host path at fp32 tolerance
    (the device QDM interpolates in float32; params come from the
    jitted nanpercentile)."""
    base_fp, bias_fp, fut_fp = presrat_files
    calc_h = PresRat(base_fp, bias_fp, fut_fp, 'pr', 'pr', **KW)
    host = calc_h.run(fill_extend=False, use_device=False)
    calc_d = PresRat(base_fp, bias_fp, fut_fp, 'pr', 'pr', **KW)
    dev = calc_d.run(fill_extend=False, use_device=True)
    for key in host:
        h, d = host[key], dev[key]
        assert np.array_equal(np.isnan(h), np.isnan(d)), key
        denom = np.maximum(np.abs(h[np.isfinite(h)]), 1e-12)
        rel = np.abs(d[np.isfinite(d)] - h[np.isfinite(h)]) / denom
        # tau_fut picks an order statistic — a one-slot index shift
        # at fp32 rounding can move it by one sample, so bound the
        # 99.9th percentile of the relative error instead of the max
        tol = 5e-4 if key.endswith('_tau_fut') else 2e-4
        assert np.quantile(rel, 0.999) < tol, (key, rel.max())


def test_auto_use_device_off_on_cpu(presrat_files):
    """use_device=None resolves to the host path on the CPU backend
    (tests pin jax to cpu), so run(None) == run(False)."""
    base_fp, bias_fp, fut_fp = presrat_files
    assert PresRat._resolve_use_device(None) is False
    assert PresRat._resolve_use_device(True) is True


def test_threaded_matches_serial_batched(presrat_files):
    """The threaded base-retrieval loop doesn't perturb results."""
    base_fp, bias_fp, fut_fp = presrat_files
    out_s = PresRat(base_fp, bias_fp, fut_fp, 'pr', 'pr', **KW).run(
        max_workers=1, fill_extend=False)
    out_p = PresRat(base_fp, bias_fp, fut_fp, 'pr', 'pr', **KW).run(
        max_workers=4, fill_extend=False)
    for k in out_s:
        np.testing.assert_array_equal(out_p[k], out_s[k])


def test_overlapping_windows_match_per_gid(presrat_files):
    """Custom window_size LARGER than the spacing makes day-of-year
    windows overlap; the batched correction must preserve the per-gid
    loop's later-window-overwrites semantics (PresRat._correct_fut
    window order)."""
    base_fp, bias_fp, fut_fp = presrat_files
    kw = dict(n_quantiles=11, n_time_steps=4, window_size=150,
              zero_rate_threshold=1e-5)
    calc = PresRat(base_fp, bias_fp, fut_fp, 'pr', 'pr', **kw)
    expected = _per_gid_expected(calc)
    got = calc.run(fill_extend=False, use_device=False)
    for key in expected:
        if key.endswith(('_tau_fut', '_k_factor')):
            np.testing.assert_allclose(got[key], expected[key],
                                       rtol=1e-5, equal_nan=True,
                                       err_msg=key)
        else:
            np.testing.assert_array_equal(got[key], expected[key],
                                          err_msg=key)


def test_device_overlapping_windows(presrat_files):
    """Device path handles overlapping windows at fp32 tolerance."""
    base_fp, bias_fp, fut_fp = presrat_files
    kw = dict(n_quantiles=11, n_time_steps=4, window_size=150,
              zero_rate_threshold=1e-5)
    host = PresRat(base_fp, bias_fp, fut_fp, 'pr', 'pr', **kw).run(
        fill_extend=False, use_device=False)
    dev = PresRat(base_fp, bias_fp, fut_fp, 'pr', 'pr', **kw).run(
        fill_extend=False, use_device=True)
    for key in host:
        h, d = host[key], dev[key]
        assert np.array_equal(np.isnan(h), np.isnan(d)), key
        hf, df = h[np.isfinite(h)], d[np.isfinite(d)]
        rel = np.abs(df - hf) / np.maximum(np.abs(hf), 1e-12)
        assert np.quantile(rel, 0.999) < 5e-4, (key, rel.max())


def test_partial_year_bias_coverage_stays_nan(tmp_path):
    """Bias-historical data covering only part of the year: windows
    with no bias samples must stay NaN in the corrected series (the
    per-gid `_correct_fut` guard) — relative-mode delta repair must
    NOT leak finite values through all-NaN mh params (round-3 review
    finding)."""
    base_fp = make_fake_h5_file(
        str(tmp_path / 'base.h5'), (6, 6, 24 * 360), ['pr'],
        freq='h', value_range=(0, 5e-4), scale_factor=1e7,
        lat_range=(40.0, 39.0), lon_range=(-105.5, -104.3))
    # bias history: ~Jan-Jun only (180 days)
    bias_fp = make_fake_nc_file(
        str(tmp_path / 'hist.nc'), (3, 3, 180), ['pr'], freq='D',
        lat_range=(40.0, 39.0), lon_range=(-105.5, -104.3))
    # future: full year
    fut_fp = make_fake_nc_file(
        str(tmp_path / 'fut.nc'), (3, 3, 360), ['pr'], freq='D',
        lat_range=(40.0, 39.0), lon_range=(-105.5, -104.3))
    kw = dict(n_quantiles=11, n_time_steps=4,
              zero_rate_threshold=1e-5)
    calc = PresRat(base_fp, bias_fp, fut_fp, 'pr', 'pr', **kw)
    expected = _per_gid_expected(calc)
    got = calc.run(fill_extend=False, use_device=False)
    # the uncovered windows' K factors are NaN in BOTH paths
    k_exp = expected['pr_k_factor']
    k_got = got['pr_k_factor']
    assert np.isnan(k_exp).any(), 'fixture must leave empty windows'
    np.testing.assert_array_equal(np.isnan(k_got), np.isnan(k_exp))
    np.testing.assert_allclose(k_got, k_exp, rtol=1e-5,
                               equal_nan=True)
    np.testing.assert_allclose(
        got['pr_tau_fut'], expected['pr_tau_fut'], rtol=1e-4,
        equal_nan=True)
    # device path agrees on the NaN structure too
    dev = PresRat(base_fp, bias_fp, fut_fp, 'pr', 'pr', **kw).run(
        fill_extend=False, use_device=True)
    np.testing.assert_array_equal(
        np.isnan(dev['pr_k_factor']), np.isnan(k_exp))
