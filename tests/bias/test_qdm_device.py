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
