"""Bias calculation + runtime transforms (mirrors reference tests/bias/)."""

import h5py
import numpy as np
import pandas as pd
import pytest

from sup3r_tpu.bias import (
    LinearCorrection,
    MonthlyLinearCorrection,
    PresRat,
    QuantileDeltaMappingCorrection,
    ScalarCorrection,
    SkillAssessment,
    global_linear_bc,
    local_linear_bc,
    local_qdm_bc,
    local_presrat_bc,
    monthly_local_linear_bc,
)
from sup3r_tpu.bias.qdm_math import (
    QuantileDeltaMapping,
    sampled_quantiles,
)
from sup3r_tpu.bias.transforms import get_date_range_kwargs
from sup3r_tpu.utilities.test_helpers import (
    make_fake_h5_file,
    make_fake_nc_file,
)

RNG = np.random.default_rng(11)


@pytest.fixture
def paired_files(tmp_path):
    """Base WTK-style h5 + biased GCM nc on overlapping grids."""
    base_fp = make_fake_h5_file(
        str(tmp_path / 'base.h5'), (20, 20, 480), ['windspeed_100m'],
        freq='h', value_range=(0, 20),
        lat_range=(40.0, 39.0), lon_range=(-105.5, -104.3))
    bias_fp = make_fake_nc_file(
        str(tmp_path / 'bias.nc'), (10, 10, 100), ['u100'], freq='D',
        lat_range=(40.0, 39.0), lon_range=(-105.5, -104.3))
    return base_fp, bias_fp


def test_qdm_math_identity():
    """QDM with identical distributions is (nearly) identity."""
    params = np.percentile(RNG.normal(10, 2, 2000),
                           sampled_quantiles(101) * 100)
    qdm = QuantileDeltaMapping(params[None], params[None],
                               params[None], relative=False)
    x = RNG.normal(10, 2, (50, 1))
    np.testing.assert_allclose(qdm(x), x, atol=0.1)


def test_qdm_math_corrects_bias():
    """QDM removes a known additive bias (absolute mode)."""
    base = RNG.normal(10, 2, 5000)
    biased = base + 3.0  # model is 3 units too high
    q = sampled_quantiles(101) * 100
    qdm = QuantileDeltaMapping(
        np.percentile(base, q)[None],
        np.percentile(biased, q)[None],
        np.percentile(biased, q)[None], relative=False)
    x = RNG.normal(13, 2, (200, 1))
    corrected = qdm(x)
    assert abs(corrected.mean() - 10) < 0.3


def test_qdm_math_preserves_trend():
    """Relative QDM preserves the model's future/historical ratio."""
    base = np.abs(RNG.normal(5, 1, 5000))
    biased_hist = 2 * base
    biased_fut = 3 * base  # model predicts 1.5x increase
    q = sampled_quantiles(101) * 100
    qdm = QuantileDeltaMapping(
        np.percentile(base, q)[None],
        np.percentile(biased_hist, q)[None],
        np.percentile(biased_fut, q)[None], relative=True)
    corrected = qdm(biased_fut[:500].reshape(-1, 1))
    ratio = corrected.mean() / base.mean()
    assert 1.3 < ratio < 1.7


def test_linear_correction_calc_and_transform(paired_files, tmp_path):
    base_fp, bias_fp = paired_files
    calc = LinearCorrection(base_fp, bias_fp, 'windspeed_100m',
                            'u_100m')
    fp_out = str(tmp_path / 'bc.h5')
    out = calc.run(fp_out=fp_out, fill_extend=True)
    scalar = out['u_100m_scalar']
    adder = out['u_100m_adder']
    assert scalar.shape == (10, 10, 1)
    assert not np.isnan(scalar).any()
    with h5py.File(fp_out, 'r') as f:
        assert 'u_100m_scalar' in f and 'latitude' in f

    # runtime transform roundtrip on the same grid
    lat = np.linspace(40.0, 39.0, 10)
    lon = np.linspace(-105.5, -104.3, 10)
    lat_lon = np.dstack(np.meshgrid(lat, lon, indexing='ij'))
    data = RNG.random((10, 10, 5)).astype(np.float32)
    corrected = local_linear_bc(data, lat_lon, 'u_100m', fp_out)
    expected = data * scalar[..., :1] + adder[..., :1]
    np.testing.assert_allclose(corrected, expected, rtol=1e-4)


def test_global_linear_bc():
    data = np.ones((4, 4, 3))
    out = global_linear_bc(data, 2.0, 1.0, out_range=(0, 2.5))
    np.testing.assert_allclose(out, 2.5)


def test_monthly_correction(paired_files, tmp_path):
    base_fp, bias_fp = paired_files
    calc = MonthlyLinearCorrection(base_fp, bias_fp, 'windspeed_100m',
                                   'u_100m')
    fp_out = str(tmp_path / 'bc_monthly.h5')
    out = calc.run(fp_out=fp_out)
    assert out['u_100m_scalar'].shape == (10, 10, 12)
    # january factors computed (data starts 2023-01-01 daily, 100 days)
    assert not np.isnan(out['u_100m_scalar'][..., 0]).all()

    lat = np.linspace(40.0, 39.0, 10)
    lon = np.linspace(-105.5, -104.3, 10)
    lat_lon = np.dstack(np.meshgrid(lat, lon, indexing='ij'))
    data = RNG.random((10, 10, 31)).astype(np.float32)
    ti = pd.date_range('2023-01-01', periods=31, freq='D')
    corrected = monthly_local_linear_bc(
        data, lat_lon, 'u_100m', fp_out, get_date_range_kwargs(ti))
    assert corrected.shape == data.shape


def test_monthly_scalar_correction(paired_files, tmp_path):
    """MonthlyScalarCorrection: 12 monthly mean-ratio factors with
    zero adders (reference: bias_calc.py:344-377)."""
    from sup3r_tpu.bias import MonthlyScalarCorrection

    base_fp, bias_fp = paired_files
    calc = MonthlyScalarCorrection(base_fp, bias_fp, 'windspeed_100m',
                                   'u_100m')
    out = calc.run(fp_out=str(tmp_path / 'bc_ms.h5'))
    assert out['u_100m_scalar'].shape == (10, 10, 12)
    # adders are identically zero wherever a month had data (months
    # beyond the fixture's ~100-day span stay NaN)
    adder = out['u_100m_adder']
    assert np.isfinite(adder).any()
    np.testing.assert_allclose(adder[np.isfinite(adder)], 0)
    # populated months carry strictly positive wind mean-ratios
    jan = out['u_100m_scalar'][..., 0]
    assert np.isfinite(jan).any() and np.nanmin(jan) > 0


def test_scalar_correction(paired_files, tmp_path):
    base_fp, bias_fp = paired_files
    calc = ScalarCorrection(base_fp, bias_fp, 'windspeed_100m',
                            'u_100m')
    out = calc.run()
    np.testing.assert_allclose(out['u_100m_adder'], 0)


def test_skill_assessment(paired_files):
    base_fp, bias_fp = paired_files
    calc = SkillAssessment(base_fp, bias_fp, 'windspeed_100m', 'u_100m')
    out = calc.run()
    assert 'u_100m_ks_stat' in out
    assert np.nanmax(out['u_100m_ks_stat']) <= 1.0
    assert 'base_windspeed_100m_percentile_50' in out


def test_linear_correction_threaded_matches_serial(paired_files,
                                                   tmp_path):
    """max_workers>1 (thread fan-out over gids) produces identical
    factor rasters to the serial loop."""
    base_fp, bias_fp = paired_files
    calc = LinearCorrection(base_fp, bias_fp, 'windspeed_100m',
                            'u_100m')
    out1 = calc.run(fill_extend=False, max_workers=1)
    calc2 = LinearCorrection(base_fp, bias_fp, 'windspeed_100m',
                             'u_100m')
    out2 = calc2.run(fill_extend=False, max_workers=4)
    assert sorted(out1) == sorted(out2)
    for k in out1:
        np.testing.assert_allclose(out1[k], out2[k], equal_nan=True)


def test_qdm_correction_and_transform(tmp_path):
    base_fp = make_fake_h5_file(
        str(tmp_path / 'base.h5'), (20, 20, 24 * 365), ['ghi'],
        freq='h', value_range=(0, 1000),
        lat_range=(40.0, 39.0), lon_range=(-105.5, -104.3))
    bias_fp = make_fake_nc_file(
        str(tmp_path / 'hist.nc'), (8, 8, 365), ['rsds'], freq='D',
        lat_range=(40.0, 39.0), lon_range=(-105.5, -104.3))
    fut_fp = make_fake_nc_file(
        str(tmp_path / 'fut.nc'), (8, 8, 365), ['rsds'], freq='D',
        lat_range=(40.0, 39.0), lon_range=(-105.5, -104.3))
    calc = QuantileDeltaMappingCorrection(
        base_fp, bias_fp, fut_fp, 'ghi', 'rsds', n_quantiles=21,
        n_time_steps=4)
    fp_out = str(tmp_path / 'qdm.h5')
    out = calc.run(fp_out=fp_out)
    assert out['base_ghi_params'].shape == (8, 8, 4, 21)
    # params monotonic in quantile axis
    p = out['base_ghi_params'][4, 4, 0]
    assert np.all(np.diff(p) >= 0)

    lat = np.linspace(40.0, 39.0, 8)
    lon = np.linspace(-105.5, -104.3, 8)
    lat_lon = np.dstack(np.meshgrid(lat, lon, indexing='ij'))
    data = 500 * RNG.random((8, 8, 60)).astype(np.float32)
    ti = pd.date_range('2050-01-01', periods=60, freq='D')
    corrected = local_qdm_bc(data, lat_lon, 'ghi', 'rsds', fp_out,
                             get_date_range_kwargs(ti))
    assert corrected.shape == data.shape
    assert np.isfinite(corrected).all()


def test_presrat(tmp_path):
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
    calc = PresRat(base_fp, bias_fp, fut_fp, 'pr', 'pr',
                   n_quantiles=11, n_time_steps=2,
                   zero_rate_threshold=1e-5)
    fp_out = str(tmp_path / 'presrat.h5')
    out = calc.run(fp_out=fp_out)
    assert 'pr_tau_fut' in out and 'pr_k_factor' in out
    assert out['pr_k_factor'].shape == (5, 5, 2)
    assert np.isfinite(out['pr_k_factor']).all()

    lat = np.linspace(40.0, 39.0, 5)
    lon = np.linspace(-105.5, -104.3, 5)
    lat_lon = np.dstack(np.meshgrid(lat, lon, indexing='ij'))
    data = (5e-4 * RNG.random((5, 5, 30))).astype(np.float32)
    ti = pd.date_range('2050-01-01', periods=30, freq='D')
    corrected = local_presrat_bc(
        data, lat_lon, 'pr', 'pr', fp_out, get_date_range_kwargs(ti))
    assert corrected.shape == data.shape
    assert (corrected >= 0).all()


def test_fwp_integration_with_bias_correction(tmp_path):
    """Forward pass applies bias correction to chunk inputs."""
    from sup3r_tpu.pipeline import ForwardPass, ForwardPassStrategy
    from tests.forward_pass.test_forward_pass import (
        _s_gen_config,
        _save_model,
    )

    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'),
                                   (10, 10, 4), ['u100', 'v100'])
    model_dir, _ = _save_model(tmp_path, _s_gen_config(), 2, 1,
                               is_5d=False)

    # factor file: scalar 2, adder 1 everywhere
    fp_bc = str(tmp_path / 'bc.h5')
    lat = np.linspace(40.0, 39.0, 10)
    lon = np.linspace(-105.5, -104.3, 10)
    lat2d, lon2d = np.meshgrid(lat, lon, indexing='ij')
    with h5py.File(fp_bc, 'w') as f:
        f.create_dataset('latitude', data=lat2d)
        f.create_dataset('longitude', data=lon2d)
        f.create_dataset('u_100m_scalar', data=2 * np.ones((10, 10, 1)))
        f.create_dataset('u_100m_adder', data=np.ones((10, 10, 1)))

    common = dict(
        file_paths=input_file,
        model_kwargs={'model_dir': model_dir},
        fwp_chunk_shape=(10, 10, 4), spatial_pad=0, temporal_pad=0,
        out_pattern=None)
    strat_bc = ForwardPassStrategy(
        **common, bias_correct_method='local_linear_bc',
        bias_correct_kwargs={'u_100m': {'bias_fp': fp_bc}})
    strat_raw = ForwardPassStrategy(**common)
    chunk_bc, _ = strat_bc.prep_chunk_data(0)
    chunk_raw, _ = strat_raw.prep_chunk_data(0)
    np.testing.assert_allclose(chunk_bc[..., 0],
                               chunk_raw[..., 0] * 2 + 1, rtol=1e-5)
    np.testing.assert_allclose(chunk_bc[..., 1], chunk_raw[..., 1])


def test_fwp_bias_correction_chunk_windowing(tmp_path):
    """Spatially-varying factors are windowed domain->chunk via
    lr_padded_slice for every padded chunk (reference contract:
    bias_transforms.py lr_padded_slice args)."""
    from sup3r_tpu.pipeline import ForwardPassStrategy
    from tests.forward_pass.test_forward_pass import (
        _s_gen_config,
        _save_model,
    )

    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'),
                                   (12, 12, 4), ['u100', 'v100'])
    model_dir, _ = _save_model(tmp_path, _s_gen_config(), 2, 1,
                               is_5d=False)
    lat = np.linspace(40.0, 39.0, 12)
    lon = np.linspace(-105.5, -104.3, 12)
    lat2d, lon2d = np.meshgrid(lat, lon, indexing='ij')
    scalar = (1.0 + np.arange(12)[:, None] * 0.1
              + np.arange(12)[None, :] * 0.01)
    fp_bc = str(tmp_path / 'bc.h5')
    with h5py.File(fp_bc, 'w') as f:
        f.create_dataset('latitude', data=lat2d)
        f.create_dataset('longitude', data=lon2d)
        f.create_dataset('u_100m_scalar', data=scalar[..., None])
        f.create_dataset('u_100m_adder', data=np.zeros((12, 12, 1)))

    common = dict(
        file_paths=input_file,
        model_kwargs={'model_dir': model_dir},
        fwp_chunk_shape=(6, 6, 4), spatial_pad=1, temporal_pad=0,
        out_pattern=None)
    strat_bc = ForwardPassStrategy(
        **common, bias_correct_method='local_linear_bc',
        bias_correct_kwargs={'u_100m': {'bias_fp': fp_bc}})
    strat_raw = ForwardPassStrategy(**common)
    for idx in range(strat_bc.fwp_slicer.n_chunks):
        s_idx, _ = strat_bc.fwp_slicer.get_chunk_indices(idx)
        pad = strat_bc.fwp_slicer.s_lr_pad_slices[s_idx]
        chunk_bc, _ = strat_bc.prep_chunk_data(idx)
        chunk_raw, _ = strat_raw.prep_chunk_data(idx)
        expected = chunk_raw[..., 0] * scalar[pad[0], pad[1]][..., None]
        np.testing.assert_allclose(chunk_bc[..., 0], expected, rtol=1e-5)
