"""Accuracy-budgeted fast inference mode (VERDICT r3 item 2): one
``inference_mode='fast'`` flag enables subpixel tail + bf16 body, and
this suite VALIDATES the budget — stitched forward-pass output within
atol of the exact path and QA wavenumber/frequency spectra unchanged
within tolerance. Exact mode stays the default.

Reference serves plain fp32 Keras inference (sup3r/models/base.py
generate); the fast profile is a TPU-native addition.
"""

import os

import h5py
import numpy as np
import pytest

from sup3r_tpu.models import LinearInterp, MultiStepGan, Sup3rGan
from sup3r_tpu.pipeline import ForwardPass, ForwardPassStrategy
from sup3r_tpu.qa.utilities import (
    frequency_spectrum,
    wavenumber_spectrum,
)
from sup3r_tpu.utilities.test_helpers import make_fake_nc_file
from tests.forward_pass.test_forward_pass import (
    _st_gen_config,
    _save_model,
)


def _tiny_gan():
    gen = [{'class': 'Conv2D', 'filters': 8, 'kernel_size': 3,
            'strides': 1, 'padding': 'same'},
           {'class': 'SpatialExpansion', 'spatial_mult': 2},
           {'class': 'Conv2D', 'filters': 2, 'kernel_size': 3,
            'strides': 1, 'padding': 'same'}]
    disc = [{'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]
    return Sup3rGan(gen, disc)


def test_inference_mode_flags():
    m = _tiny_gan()
    assert m.inference_mode == 'exact'
    m.inference_mode = 'fast'
    assert m.inference_subpixel_tail is True
    assert m.inference_dtype == 'bfloat16'
    assert m.inference_mode == 'fast'
    m.inference_mode = 'exact'
    assert m.inference_subpixel_tail is False
    assert m.inference_dtype is None
    # hand-set combinations report 'custom'
    m.inference_dtype = 'bfloat16'
    assert m.inference_mode == 'custom'
    with pytest.raises(ValueError, match='exact.*fast'):
        m.inference_mode = 'turbo'


def test_multistep_propagates_inference_mode():
    a, b = _tiny_gan(), _tiny_gan()
    chain = MultiStepGan([a, b])
    assert chain.inference_mode == 'exact'
    chain.inference_mode = 'fast'
    assert a.inference_mode == 'fast'
    assert b.inference_mode == 'fast'
    assert chain.inference_mode == 'fast'
    a.inference_mode = 'exact'
    assert chain.inference_mode == 'custom'


def test_strategy_rejects_unsupported_model(tmp_path):
    input_file = make_fake_nc_file(str(tmp_path / 'in.nc'),
                                   (8, 8, 4), ['u100', 'v100'])
    mdir = str(tmp_path / 'linear')
    LinearInterp(['u_100m', 'v_100m'], s_enhance=2,
                 t_enhance=1).save(mdir)
    with pytest.raises(ValueError, match='does not support'):
        ForwardPassStrategy(
            file_paths=input_file, model_class='LinearInterp',
            model_kwargs={'model_dir': mdir},
            fwp_chunk_shape=(8, 8, 4), spatial_pad=0, temporal_pad=0,
            out_pattern=None, inference_mode='fast')


def _run_mode(input_file, model_dir, out_dir, mode):
    os.makedirs(out_dir)
    strategy = ForwardPassStrategy(
        file_paths=input_file, model_class='Sup3rGan',
        model_kwargs={'model_dir': model_dir},
        fwp_chunk_shape=(6, 6, 8), spatial_pad=2, temporal_pad=2,
        out_pattern=os.path.join(str(out_dir), 'chunk_{file_id}.h5'),
        inference_mode=mode)
    ForwardPass.run(strategy, 0)
    out = {}
    for name in sorted(os.listdir(out_dir)):
        with h5py.File(os.path.join(str(out_dir), name), 'r') as f:
            # decode stored ints to physical floats — raw uint16
            # arithmetic would wrap on subtraction (0 - 1 == 65535)
            out[name] = {
                feat: f[feat][:].astype(np.float64)
                / f[feat].attrs.get('scale_factor', 1.0)
                for feat in ('windspeed_100m', 'winddirection_100m')}
    return out


def test_fast_mode_accuracy_budget(tmp_path):
    """The headline budget: full chunked 5D forward pass in 'fast'
    mode (subpixel tail engaged + bf16 body) vs 'exact', per-chunk
    stitched outputs within atol 0.05 on the data scale, direction
    within 2 deg where speed is non-negligible, and QA spectra
    log10-equal within 0.1 (~26% per bin)."""
    input_file = make_fake_nc_file(str(tmp_path / 'in.nc'),
                                   (12, 12, 16), ['u100', 'v100'])
    model_dir, _ = _save_model(tmp_path, _st_gen_config(), 3, 4,
                               is_5d=True)
    exact = _run_mode(input_file, model_dir, tmp_path / 'exact',
                      'exact')
    fast = _run_mode(input_file, model_dir, tmp_path / 'fast', 'fast')
    assert set(exact) == set(fast) and exact

    engaged = False
    max_err = 0.0
    for name, feats in exact.items():
        ws_e = feats['windspeed_100m']
        ws_f = fast[name]['windspeed_100m']
        scale = max(1.0, float(np.abs(ws_e).max()))
        err = float(np.abs(ws_f - ws_e).max())
        max_err = max(max_err, err / scale)
        assert err <= 0.05 * scale, (name, err, scale)
        engaged = engaged or err > 0.0

        wd_e = feats['winddirection_100m']
        wd_f = fast[name]['winddirection_100m']
        circ = np.abs((wd_f - wd_e + 180.0) % 360.0 - 180.0)
        strong = ws_e > 0.2 * scale
        assert circ[strong].max() <= 2.0, (name, circ[strong].max())
    # the budget must be measured on a genuinely different compute
    # path — identical outputs would mean fast mode never engaged
    assert engaged, 'fast mode produced bit-identical outputs'

    # QA spectra: stack one chunk's windspeed into (time, lat, lon)
    name = sorted(exact)[0]
    n_gids = exact[name]['windspeed_100m'].shape[1]
    side = int(np.sqrt(n_gids))
    cube_e = exact[name]['windspeed_100m'].reshape(-1, side, side)
    cube_f = fast[name]['windspeed_100m'].reshape(-1, side, side)
    _, wk_e = wavenumber_spectrum(cube_e[0])
    _, wk_f = wavenumber_spectrum(cube_f[0])
    np.testing.assert_allclose(np.log10(wk_f), np.log10(wk_e),
                               atol=0.1)
    _, fr_e = frequency_spectrum(np.moveaxis(cube_e, 0, -1))
    _, fr_f = frequency_spectrum(np.moveaxis(cube_f, 0, -1))
    np.testing.assert_allclose(np.log10(fr_f), np.log10(fr_e),
                               atol=0.1)


def test_fast_mode_solar_chain_budget(tmp_path):
    """Fast-mode accuracy budget through the FULL SolarMultiStepGan
    chain (VERDICT r4 #8): spatial solar + wind GANs -> temporal
    SolarCC-style member -> chunk files -> Solar module irradiance.
    The stitched clearsky_ratio chunks must stay within 0.05 of the
    exact path on the data scale, and the derived GHI within 5% of
    the exact GHI's peak (the csr error times the clearsky curve)."""
    from sup3r_tpu.solar import Solar
    from tests.forward_pass.test_sup3rcc_chain import (
        _spatial_gan,
        _temporal_solar_gan,
    )
    from tests.solar_qa.test_solar_qa import _make_fake_nsrdb

    input_file = make_fake_nc_file(
        str(tmp_path / 'gcm.nc'), (8, 8, 2),
        ['clearsky_ratio', 'u_200m', 'v_200m'], freq='D',
        start='2050-06-01')
    ssm = _spatial_gan(tmp_path, 'ssm', ['clearsky_ratio'], 1)
    swm = _spatial_gan(tmp_path, 'swm', ['u_200m', 'v_200m'], 2)
    tsm = _temporal_solar_gan(tmp_path)
    # ONE nsrdb fixture for both modes (it is randomly generated)
    nsrdb_fp = _make_fake_nsrdb(str(tmp_path / 'nsrdb.h5'),
                                (20, 20, 96), start='2050-06-01')

    def run_chain(mode):
        out_dir = tmp_path / f'out_{mode}'
        strategy = ForwardPassStrategy(
            file_paths=input_file,
            model_class='SolarMultiStepGan',
            model_kwargs={'spatial_solar_model_dirs': ssm,
                          'spatial_wind_model_dirs': swm,
                          'temporal_solar_model_dirs': tsm},
            fwp_chunk_shape=(8, 8, 1),
            spatial_pad=0, temporal_pad=0,
            inference_mode=mode,
            out_pattern=str(out_dir / 'sup3r_chunk_{file_id}.h5'))
        ForwardPass.run(strategy, 0)
        chunks = {}
        for fp in sorted(out_dir.glob('sup3r_chunk_*.h5')):
            with h5py.File(fp, 'r') as f:
                d = f['clearsky_ratio']
                chunks[fp.name] = d[:] / d.attrs.get('scale_factor', 1)
        written = Solar.run_temporal_chunks(
            str(out_dir / 'sup3r_chunk_*.h5'), nsrdb_fp, tz=-6)
        with h5py.File(written[0], 'r') as f:
            ghi = f['ghi'][:] / f['ghi'].attrs['scale_factor']
        return chunks, ghi

    chunks_e, ghi_e = run_chain('exact')
    chunks_f, ghi_f = run_chain('fast')
    assert set(chunks_e) == set(chunks_f) and chunks_e

    engaged = False
    for name, csr_e in chunks_e.items():
        csr_f = chunks_f[name]
        scale = max(1.0, float(np.abs(csr_e).max()))
        err = float(np.abs(csr_f - csr_e).max())
        assert err <= 0.05 * scale, (name, err, scale)
        engaged = engaged or err > 0.0
    assert engaged, 'fast mode never engaged through the solar chain'

    # irradiance: csr error propagates multiplicatively through the
    # clearsky curve; bound it at 5% of the exact GHI peak
    assert ghi_e.max() > 0
    assert np.abs(ghi_f - ghi_e).max() <= 0.05 * ghi_e.max()
