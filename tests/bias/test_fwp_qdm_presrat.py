"""QDM and PresRat runtime transforms THROUGH the forward-pass
strategy (mirrors reference tests/bias/test_qdm_bias_correction.py:455
and test_presrat_bias_correction.py:739 fwp integrations): chunk prep
must window the factor rasters, inject the chunk's date range, and
reproduce the standalone transform."""

import json

import h5py
import numpy as np
import pytest

from sup3r_tpu.bias import local_presrat_bc, local_qdm_bc
from sup3r_tpu.bias.qdm_math import sampled_quantiles
from sup3r_tpu.pipeline import ForwardPassStrategy
from sup3r_tpu.utilities.test_helpers import make_fake_nc_file
from tests.forward_pass.test_forward_pass import (
    _s_gen_config,
    _save_model,
)

RNG = np.random.default_rng(19)
S = 10
NQ = 21
NT = 2


def _qdm_file(fp, with_presrat=False, k=1.1, tau=0.0):
    """Synthetic factor file on the input grid with a +2 offset
    correction (oh = mh - 2 ... i.e. corrected = data - 2)."""
    lat = np.linspace(40.0, 39.0, S)[:, None].repeat(S, axis=1)
    lon = np.linspace(-105.5, -104.3, S)[None].repeat(S, axis=0)
    q = sampled_quantiles(NQ) * 100
    base_row = np.nanpercentile(RNG.normal(10, 2, 4000), q)
    mh = np.broadcast_to(base_row + 2,
                         (S, S, NT, NQ)).astype(np.float32)
    oh = np.broadcast_to(base_row, (S, S, NT, NQ)).astype(np.float32)
    mf = mh.copy()
    with h5py.File(fp, 'w') as f:
        f.create_dataset('latitude', data=lat)
        f.create_dataset('longitude', data=lon)
        f.create_dataset('base_ws_params', data=oh)
        f.create_dataset('bias_u_100m_params', data=mh)
        f.create_dataset('bias_fut_u_100m_params', data=mf)
        if with_presrat:
            f.create_dataset(
                'u_100m_tau_fut',
                data=np.full((S, S, 1), tau, np.float32))
            f.create_dataset(
                'u_100m_k_factor',
                data=np.full((S, S, NT), k, np.float32))
        f.attrs['cfg'] = json.dumps({
            'time_window_center': [91.25, 273.75],
            'sampling': 'linear', 'log_base': 10})
    return fp


def _strategy(tmp_path, input_file, model_dir, method, bc_kwargs):
    return ForwardPassStrategy(
        file_paths=input_file,
        model_kwargs={'model_dir': model_dir},
        fwp_chunk_shape=(S, S, 4), spatial_pad=0, temporal_pad=0,
        out_pattern=None,
        bias_correct_method=method,
        bias_correct_kwargs=bc_kwargs)


def test_fwp_qdm_integration(tmp_path):
    """local_qdm_bc through prep_chunk_data == the standalone
    transform with the chunk's own date range, and the absolute
    correction removes the constructed +2 bias."""
    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'),
                                   (S, S, 4), ['u100', 'v100'])
    model_dir, _ = _save_model(tmp_path, _s_gen_config(), 2, 1,
                               is_5d=False)
    fp_bc = _qdm_file(str(tmp_path / 'qdm.h5'))
    kwargs = {'u_100m': {'bias_fp': fp_bc, 'base_dset': 'ws',
                         'relative': False}}
    strat = _strategy(tmp_path, input_file, model_dir,
                      'local_qdm_bc', kwargs)
    strat_raw = ForwardPassStrategy(
        file_paths=input_file, model_kwargs={'model_dir': model_dir},
        fwp_chunk_shape=(S, S, 4), spatial_pad=0, temporal_pad=0,
        out_pattern=None)
    chunk_bc, ti = strat.prep_chunk_data(0)
    chunk_raw, _ = strat_raw.prep_chunk_data(0)
    from sup3r_tpu.bias.transforms import get_date_range_kwargs

    lat_lon = strat_raw.input_handler.lat_lon
    expected = local_qdm_bc(
        np.asarray(chunk_raw[..., 0]), np.asarray(lat_lon), 'ws',
        'u_100m', fp_bc,
        date_range_kwargs=get_date_range_kwargs(
            strat_raw.input_handler.time_index), relative=False)
    np.testing.assert_allclose(chunk_bc[..., 0], expected, rtol=1e-5)
    # the v channel is untouched; the u correction is ~ -2
    np.testing.assert_allclose(chunk_bc[..., 1], chunk_raw[..., 1])
    shift = np.nanmean(chunk_bc[..., 0] - chunk_raw[..., 0])
    assert abs(shift + 2) < 0.3, shift


def test_fwp_presrat_integration(tmp_path):
    """local_presrat_bc through prep_chunk_data: QDM correction + tau
    zeroing + K scaling all land on the chunk."""
    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'),
                                   (S, S, 4), ['pr', 'u100'])
    model_dir, _ = _save_model(
        tmp_path, _s_gen_config(), 2, 1, is_5d=False,
        features=['pr', 'u_100m'])
    k = 1.25
    fp_bc = _qdm_file(str(tmp_path / 'presrat.h5'), with_presrat=True,
                      k=k, tau=9.0)
    kwargs = {'pr': {'bias_fp': fp_bc, 'base_dset': 'ws',
                     'relative': False}}
    # the factor file stores u_100m-named params; point the pr
    # channel at them via feature_name override
    kwargs['pr']['feature_name'] = 'u_100m'
    strat = _strategy(tmp_path, input_file, model_dir,
                      'local_presrat_bc', kwargs)
    strat_raw = ForwardPassStrategy(
        file_paths=input_file, model_kwargs={'model_dir': model_dir},
        fwp_chunk_shape=(S, S, 4), spatial_pad=0, temporal_pad=0,
        out_pattern=None)
    chunk_bc, _ = strat.prep_chunk_data(0)
    chunk_raw, _ = strat_raw.prep_chunk_data(0)
    from sup3r_tpu.bias.transforms import get_date_range_kwargs

    lat_lon = strat_raw.input_handler.lat_lon
    expected = local_presrat_bc(
        np.asarray(chunk_raw[..., 0]), np.asarray(lat_lon), 'ws',
        'u_100m', fp_bc,
        date_range_kwargs=get_date_range_kwargs(
            strat_raw.input_handler.time_index), relative=False)
    np.testing.assert_allclose(chunk_bc[..., 0], expected, rtol=1e-5)
    # tau=9 zeroes values whose correction lands below 9; K scales
    # the rest by 1.25: everything is either 0 or scaled
    vals = chunk_bc[..., 0]
    assert ((vals == 0) | (vals > 0)).all()
    # some zeroing happened (raw values are U(0, 1)-ish; corrected
    # ~ raw - 2 < 9 everywhere -> all zero): make the invariant sharp
    assert (vals == 0).all()


def test_fwp_presrat_no_zero_rate(tmp_path):
    """tau below the data range leaves values unzeroed and K applies
    (reference: test_presrat_transform_nozerochanges)."""
    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'),
                                   (S, S, 4), ['pr', 'u100'])
    model_dir, _ = _save_model(
        tmp_path, _s_gen_config(), 2, 1, is_5d=False,
        features=['pr', 'u_100m'])
    k = 1.25
    fp_bc = _qdm_file(str(tmp_path / 'presrat.h5'), with_presrat=True,
                      k=k, tau=-1e9)
    kwargs = {'pr': {'bias_fp': fp_bc, 'base_dset': 'ws',
                     'relative': False, 'feature_name': 'u_100m'}}
    strat = _strategy(tmp_path, input_file, model_dir,
                      'local_presrat_bc', kwargs)
    strat_raw = ForwardPassStrategy(
        file_paths=input_file, model_kwargs={'model_dir': model_dir},
        fwp_chunk_shape=(S, S, 4), spatial_pad=0, temporal_pad=0,
        out_pattern=None)
    chunk_bc, _ = strat.prep_chunk_data(0)
    chunk_raw, _ = strat_raw.prep_chunk_data(0)
    # correction -2 then x1.25
    np.testing.assert_allclose(
        chunk_bc[..., 0], (chunk_raw[..., 0] - 2) * k,
        rtol=1e-3, atol=5e-2)


def test_fwp_qdm_chunked_io_matches_eager(tmp_path):
    """Bias correction composes with chunked_io=True: per-chunk
    windowed reads + windowed factor rasters produce the same
    corrected chunk data as the eager full-domain strategy — on a
    MULTI-chunk layout so lr_padded_slice windowing is exercised off
    the origin."""
    input_file = make_fake_nc_file(str(tmp_path / 'input.nc'),
                                   (S, S, 4), ['u100', 'v100'])
    model_dir, _ = _save_model(tmp_path, _s_gen_config(), 2, 1,
                               is_5d=False)
    fp_bc = _qdm_file(str(tmp_path / 'qdm.h5'))
    bc_kwargs = {'u_100m': {'bias_fp': fp_bc, 'base_dset': 'ws',
                            'relative': False}}
    common = dict(
        file_paths=input_file, model_kwargs={'model_dir': model_dir},
        fwp_chunk_shape=(5, 5, 4), spatial_pad=0, temporal_pad=0,
        out_pattern=None, bias_correct_method='local_qdm_bc',
        bias_correct_kwargs=bc_kwargs)
    eager = ForwardPassStrategy(**common)
    chunked = ForwardPassStrategy(chunked_io=True, **common)
    assert eager.fwp_slicer.n_chunks == chunked.fwp_slicer.n_chunks > 1
    for idx in range(eager.fwp_slicer.n_chunks):
        a, _ = eager.prep_chunk_data(idx)
        b, _ = chunked.prep_chunk_data(idx)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
