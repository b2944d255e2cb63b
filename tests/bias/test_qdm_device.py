"""Batched/device QDM parameter computation: the all-gids percentile
path must match the per-gid reference math, and the single-dispatch
device path must match the host path (SURVEY §2.7 per-gid bias
parallelism; reference fan-out: sup3r/bias/bias_calc.py:191-255)."""

import numpy as np
import pytest

from sup3r_tpu.bias import QuantileDeltaMappingCorrection
from sup3r_tpu.bias.qdm_math import sampled_quantiles
from sup3r_tpu.bias.transforms import window_mask
from sup3r_tpu.utilities.test_helpers import (
    make_fake_h5_file,
    make_fake_nc_file,
)


@pytest.fixture
def qdm_calc(tmp_path):
    base_fp = make_fake_h5_file(
        str(tmp_path / 'base.h5'), (12, 12, 24 * 365), ['ghi'],
        freq='h', value_range=(0, 1000),
        lat_range=(40.0, 39.0), lon_range=(-105.5, -104.3))
    bias_fp = make_fake_nc_file(
        str(tmp_path / 'hist.nc'), (6, 6, 365), ['rsds'], freq='D',
        lat_range=(40.0, 39.0), lon_range=(-105.5, -104.3))
    fut_fp = make_fake_nc_file(
        str(tmp_path / 'fut.nc'), (6, 6, 365), ['rsds'], freq='D',
        lat_range=(40.0, 39.0), lon_range=(-105.5, -104.3))
    return QuantileDeltaMappingCorrection(
        base_fp, bias_fp, fut_fp, 'ghi', 'rsds', n_quantiles=11,
        n_time_steps=4)


def test_raster_params_match_per_gid(qdm_calc):
    """The all-gids batched percentile equals the per-gid loop."""
    calc = qdm_calc
    arr = np.asarray(calc.bias_dh.data['rsds'])
    got = calc._windowed_params_raster(arr, calc.bias_time_index)
    quantiles = sampled_quantiles(calc.n_quantiles, calc.sampling,
                                  calc.log_base) * 100
    for gid in [0, 7, 35]:
        row, col = np.unravel_index(gid, calc.bias_gid_raster.shape)
        series = arr[row, col]
        for nt, d0 in enumerate(calc.time_window_center):
            mask = window_mask(calc.bias_time_index.dayofyear, d0,
                               calc.window_size)
            expected = np.nanpercentile(series[mask], quantiles)
            np.testing.assert_allclose(got[row, col, nt], expected,
                                       rtol=1e-6)


def test_device_path_matches_host(qdm_calc):
    """use_device=True (one jitted nanpercentile dispatch over padded
    windows) agrees with the host float64 path."""
    calc = qdm_calc
    arr = np.asarray(calc.bias_dh.data['rsds'])
    host = calc._windowed_params_raster(arr, calc.bias_time_index,
                                        use_device=False)
    dev = calc._windowed_params_raster(arr, calc.bias_time_index,
                                       use_device=True)
    assert host.shape == dev.shape
    # fp32 percentile vs float64: loose but meaningful tolerance
    np.testing.assert_allclose(dev, host, rtol=2e-4, atol=2e-2,
                               equal_nan=True)


def test_full_run_device_equals_host(qdm_calc, tmp_path):
    calc = qdm_calc
    out_host = calc.run(fill_extend=False)
    out_dev = calc.run(fill_extend=False, use_device=True)
    assert sorted(out_host) == sorted(out_dev)
    for k in out_host:
        np.testing.assert_allclose(out_dev[k], out_host[k], rtol=2e-4,
                                   atol=2e-2, equal_nan=True)
    # NaN structure identical (window validity + unmapped gids)
    for k in out_host:
        np.testing.assert_array_equal(np.isnan(out_dev[k]),
                                      np.isnan(out_host[k]))


def test_window_mask_reference_parity():
    """window_mask edge semantics match the reference exactly
    (reference: tests/bias/test_qdm_bias_correction.py:50-80)."""
    d = np.arange(1, 366)
    np.testing.assert_array_equal(d[window_mask(d, 60, 3)],
                                  [59, 60, 61])
    # even window rounds down at daily resolution
    np.testing.assert_array_equal(d[window_mask(d, 60, 4)],
                                  [59, 60, 61])
    # start-of-year wrap
    np.testing.assert_array_equal(d[window_mask(d, 1, 3)],
                                  [1, 2, 365])
    # end-of-year wrap
    np.testing.assert_array_equal(d[window_mask(d, 365, 3)],
                                  [1, 364, 365])


def test_sampled_quantiles_modes():
    """linear/log/invlog quantile grids (reference:
    rex bc_utils sample_q_linear/log/invlog via sup3r/bias/qdm.py
    sampling kwarg): all span [0, 1] monotonically; log concentrates
    near 0, invlog concentrates near 1."""
    n = 11
    lin = sampled_quantiles(n, 'linear')
    lg = sampled_quantiles(n, 'log')
    inv = sampled_quantiles(n, 'invlog')
    for q in (lin, lg, inv):
        assert q.shape == (n,)
        assert q[0] == 0.0 and q[-1] == pytest.approx(1.0)
        assert np.all(np.diff(q) > 0)
    # log: denser near 0 (first gap smaller than linear's);
    # invlog mirrors log around 0.5
    assert lg[1] < lin[1]
    assert inv[-2] > lin[-2]
    np.testing.assert_allclose(inv, 1 - lg[::-1], atol=1e-12)
    with pytest.raises(KeyError):
        sampled_quantiles(n, 'nope')


def test_qdm_run_with_invlog_sampling(tmp_path):
    """QDM end-to-end with sampling='invlog' (tail-focused quantiles):
    params rasters are monotone along the quantile axis and the
    sampling choice is recorded in the output attrs for the runtime
    transform (reference: sup3r/bias/qdm.py sampling/log_base
    plumbing)."""
    import h5py

    base_fp = make_fake_h5_file(
        str(tmp_path / 'base.h5'), (8, 8, 24 * 100), ['ghi'],
        freq='h', value_range=(0, 1000))
    bias_fp = make_fake_nc_file(
        str(tmp_path / 'hist.nc'), (4, 4, 100), ['rsds'], freq='D')
    fut_fp = make_fake_nc_file(
        str(tmp_path / 'fut.nc'), (4, 4, 100), ['rsds'], freq='D')
    calc = QuantileDeltaMappingCorrection(
        base_fp, bias_fp, fut_fp, 'ghi', 'rsds', n_quantiles=9,
        n_time_steps=2, sampling='invlog', log_base=10)
    fp_out = str(tmp_path / 'qdm_invlog.h5')
    out = calc.run(fp_out=fp_out)
    key = 'bias_rsds_params'
    params = out[key]
    finite_rows = np.isfinite(params).all(axis=-1)
    assert finite_rows.any()
    diffs = np.diff(params, axis=-1)[finite_rows]
    assert np.all(diffs >= 0)
    import json

    with h5py.File(fp_out) as f:
        cfg = json.loads(f.attrs['cfg'])
        assert cfg['sampling'] == 'invlog'
        assert float(cfg['log_base']) == 10
    # the runtime transform reconstructs the invlog quantile grid from
    # the file's cfg and applies cleanly
    from sup3r_tpu.bias.transforms import (
        get_date_range_kwargs,
        local_qdm_bc,
    )

    lat_lon = calc.bias_dh.lat_lon
    data = np.random.default_rng(0).random((4, 4, 50)).astype(
        np.float32) * 300
    ti = __import__('pandas').date_range('2023-01-01', periods=50,
                                         freq='D')
    corrected = local_qdm_bc(data, lat_lon, 'ghi', 'rsds', fp_out,
                             get_date_range_kwargs(ti))
    assert corrected.shape == data.shape
    assert np.isfinite(corrected).any()
