"""Solar irradiance module + QA module tests (mirror reference
tests/forward_pass/test_solar_module.py + tests/output/test_qa.py)."""

import h5py
import numpy as np
import pandas as pd
import pytest

from sup3r_tpu.qa.utilities import (
    direct_dist,
    frequency_spectrum,
    gradient_dist,
    time_derivative_dist,
    tke_wavenumber_spectrum,
    wavenumber_spectrum,
)
from sup3r_tpu.solar import Solar
from sup3r_tpu.solar.disc import calc_dhi, dark_night, disc
from sup3r_tpu.utilities import RANDOM_GENERATOR
from sup3r_tpu.utilities.test_helpers import make_fake_h5_file


def _make_fake_cs_ratio_file(path, shape, start='2050-06-01',
                             lat_range=(40.0, 39.0),
                             lon_range=(-105.5, -104.3)):
    """GAN output chunk file with clearsky_ratio (local time)."""
    return make_fake_h5_file(
        path, shape, ['clearsky_ratio'], start=start, freq='h',
        scale_factor=10000, value_range=(0.3, 1.0),
        lat_range=lat_range, lon_range=lon_range)


def _make_fake_nsrdb(path, shape, start='2050-06-01'):
    import pandas as pd

    s1, s2, t = shape
    fp = make_fake_h5_file(
        path, shape, ['clearsky_ghi', 'clearsky_dni'], start=start,
        freq='30min', scale_factor=1.0, value_range=(0, 1000),
        lat_range=(40.2, 38.9), lon_range=(-105.6, -104.2))
    # add zenith + pressure with realistic ranges
    with h5py.File(fp, 'a') as f:
        t_len = f['clearsky_ghi'].shape[0]
        sza = 20 + 60 * RANDOM_GENERATOR.random((t_len, s1 * s2))
        ds = f.create_dataset(
            'solar_zenith_angle', data=(sza * 100).astype(np.uint16))
        ds.attrs['scale_factor'] = 100.0
        pres = 800 + 200 * RANDOM_GENERATOR.random((t_len, s1 * s2))
        ds2 = f.create_dataset(
            'surface_pressure', data=pres.astype(np.float32))
        ds2.attrs['scale_factor'] = 1.0
    return fp


def test_disc_model_behavior():
    """DISC: zero at night, bounded, higher for clearer skies."""
    doy = np.array([172])
    ghi = np.array([[800.0, 400.0, 0.0]])
    sza = np.array([[20.0, 20.0, 95.0]])
    dni = disc(ghi, sza, doy)
    assert dni.shape == (1, 3)
    assert dni[0, 2] == 0  # night
    assert dni[0, 0] > dni[0, 1] > 0  # clearer -> more direct
    assert dni.max() < 1400


def test_calc_dhi_closure():
    dni = np.array([[500.0]])
    ghi = np.array([[600.0]])
    sza = np.array([[30.0]])
    dhi, dni_out = calc_dhi(dni, ghi, sza)
    np.testing.assert_allclose(
        dhi + dni_out * np.cos(np.radians(sza)), ghi, rtol=1e-5)
    # negative closure is fixed by reducing dni
    dhi2, dni2 = calc_dhi(np.array([[900.0]]), ghi, sza)
    assert dhi2[0, 0] == 0
    assert dni2[0, 0] < 900


def test_dark_night():
    irr = np.ones((2, 2))
    out = dark_night(irr, np.array([[10, 92], [88, 90]]))
    np.testing.assert_array_equal(out, [[1, 0], [1, 0]])


def test_solar_module(tmp_path):
    """GHI/DNI/DHI from csr chunks + NSRDB clearsky data."""
    gan_fp = _make_fake_cs_ratio_file(
        str(tmp_path / 'sup3r_chunk_000000_000000.h5'), (5, 5, 24))
    nsrdb_fp = _make_fake_nsrdb(str(tmp_path / 'nsrdb.h5'),
                                (10, 10, 48))
    with Solar(gan_fp, nsrdb_fp, tz=-6) as solar:
        ghi = solar.ghi
        dni = solar.dni
        dhi = solar.dhi
        assert ghi.shape == (24, 25)
        assert (ghi >= 0).all() and (dni >= 0).all() and (
            dhi >= 0).all()
        assert not solar.out_of_bounds.any()
        fp_out = str(tmp_path / 'out' / 'irradiance.h5')
        solar.write(fp_out)
    with h5py.File(fp_out, 'r') as f:
        assert 'ghi' in f and 'dni' in f and 'dhi' in f
        assert f['ghi'].shape == (24, 25)


def test_solar_fps_grouping(tmp_path):
    """Temporal chunk triplet grouping with padding slices."""
    for t in range(3):
        for s in range(2):
            _make_fake_cs_ratio_file(
                str(tmp_path / f'sup3r_chunk_{t:06d}_{s:06d}.h5'),
                (3, 3, 24))
    fp_sets, t_slices, t_ids, s_ids, targets = Solar.get_sup3r_fps(
        str(tmp_path / 'sup3r_chunk_*.h5'))
    assert len(fp_sets) == 6
    # first temporal chunk has 2 files and slice starting at 0
    assert len(fp_sets[0]) == 2 and t_slices[0] == slice(0, 24)
    # middle chunk has 3 files and starts at 24
    middle = [i for i, t in enumerate(t_ids) if t == '000001'][0]
    assert len(fp_sets[middle]) == 3
    assert t_slices[middle] == slice(24, 48)


def test_qa_module(tmp_path):
    """QA re-coarsening error is ~zero when output = enhanced source."""
    from sup3r_tpu.postprocessing.writers import OutputHandlerH5
    from sup3r_tpu.utilities.test_helpers import make_fake_nc_file
    from sup3r_tpu.qa import Sup3rQa

    src_fp = make_fake_nc_file(str(tmp_path / 'src.nc'), (6, 6, 8),
                               ['u100', 'v100'])
    from sup3r_tpu.preprocessing.loaders import LoaderNC
    from sup3r_tpu.ops import (
        spatial_simple_enhancing,
        temporal_simple_enhancing,
    )

    src = LoaderNC(src_fp).data
    hr_u = temporal_simple_enhancing(
        spatial_simple_enhancing(src['u_100m'][None, ..., None], 2),
        2, 'constant')[0, ..., 0]
    hr_v = temporal_simple_enhancing(
        spatial_simple_enhancing(src['v_100m'][None, ..., None], 2),
        2, 'constant')[0, ..., 0]
    out_fp = str(tmp_path / 'out_000000_000000.h5')
    lat = np.linspace(40.0, 39.0, 12)
    lon = np.linspace(-105.5, -104.3, 12)
    lat_lon = np.dstack(np.meshgrid(lat, lon, indexing='ij'))
    times = pd.date_range('2023-01-01', periods=16, freq='30min')
    # write u/v directly (no ws/wd inversion side effects) to nc
    from sup3r_tpu.postprocessing.writers import OutputHandlerNC

    OutputHandlerNC._write_output(
        np.stack([hr_u, hr_v], axis=-1), ['u_100m', 'v_100m'], lat_lon,
        times, out_fp.replace('.h5', '.nc'))
    qa = Sup3rQa(src_fp, out_fp.replace('.h5', '.nc'), s_enhance=2,
                 t_enhance=2, temporal_coarsening_method='average',
                 features=['u_100m', 'v_100m'],
                 qa_fp=str(tmp_path / 'qa.h5'))
    errors = qa.run()
    assert abs(errors['u_100m_error']).max() < 1e-4
    assert (tmp_path / 'qa.h5').exists()


def test_qa_metrics():
    u = RANDOM_GENERATOR.random((16, 16, 32))
    v = RANDOM_GENERATOR.random((16, 16, 32))
    freq, spec = frequency_spectrum(u)
    assert len(freq) == len(spec) and (spec > 0).all()
    k, wspec = wavenumber_spectrum(u[:, :, 0])
    assert len(k) == len(wspec)
    k2, tke = tke_wavenumber_spectrum(u[:, :, 0], v[:, :, 0])
    assert (tke > 0).all()
    centers, counts, norm = direct_dist(u)
    assert len(centers) == len(counts) == 40
    assert np.isclose(counts.sum(), 1.0)
    assert norm > 0
    _, gcounts, _ = gradient_dist(u)
    assert np.isclose(gcounts.sum(), 1.0)
    _, tcounts, _ = time_derivative_dist(u)
    assert np.isclose(tcounts.sum(), 1.0)


def test_circular_period_dists():
    """Winddirection-style wrap: a field oscillating across 0/360 must
    yield SMALL circular derivatives, where the naive diff sees ~360
    jumps (reference: qa/utilities.py:271-272,334-335)."""
    # direction alternates ~358, ~2, ... over time (jitter so the
    # percentile clip, which is strict <, keeps most values)
    wd = RANDOM_GENERATOR.random((4, 4, 20))
    wd[..., ::2] += 357.0
    wd[..., 1::2] += 1.0
    centers, counts, _ = time_derivative_dist(wd, period=360,
                                              percentile=100)
    assert np.abs(centers).max() <= 10  # wrapped: |diff| ~ 4
    centers_raw, _, _ = time_derivative_dist(wd, percentile=100)
    assert np.abs(centers_raw).max() > 300  # naive: |diff| ~ 356

    # spatial wrap along west_east
    wd_s = RANDOM_GENERATOR.random((4, 6, 3))
    wd_s[:, ::2] += 358.0
    wd_s[:, 1::2] += 0.5
    centers_s, _, _ = gradient_dist(wd_s, period=360, percentile=100)
    assert np.abs(centers_s).max() <= 10

    # direct dist wraps values into [0, period)
    centers_d, _, _ = direct_dist(np.array([-5.0, 355.0, 5.0]),
                                  period=360, percentile=100, bins=4)
    assert centers_d.min() >= 0 and centers_d.max() <= 360


def test_interpolate_fills_zero_bins():
    """interpolate=True fills interior zero-count bins from their
    nonzero neighbors (reference: qa/utilities.py:379-386)."""
    from sup3r_tpu.qa.utilities import continuous_dist

    # values only at 0 and 2 -> middle bin of 3 is empty
    diffs = np.array([0.0] * 10 + [2.0] * 10)
    counts_raw, centers = continuous_dist(diffs, bins=3, range=(0, 2))
    assert counts_raw[1] == 0
    counts_i, centers_i = continuous_dist(diffs, bins=3, range=(0, 2),
                                          interpolate=True)
    assert counts_i[1] > 0
    assert np.isclose(counts_i.sum(), 1.0)


def test_auto_bin_count():
    from sup3r_tpu.qa.utilities import continuous_dist

    diffs = np.linspace(0, 1, 11)  # spacing 0.1 -> ~10 bins
    counts, centers = continuous_dist(diffs)
    assert len(counts) == 10


def test_spectrum_range_relabeling():
    """f_range / x_range relabel the spectrum axes to physical units
    without changing amplitudes (reference: qa/utilities.py:39-43)."""
    from sup3r_tpu.qa.utilities import (
        frequency_spectrum,
        tke_frequency_spectrum,
        tke_wavenumber_spectrum,
        wavenumber_spectrum,
    )

    rng = np.random.default_rng(0)
    var = rng.random((8, 8, 32)).astype(np.float32)
    f0, s0 = frequency_spectrum(var)
    f1, s1 = frequency_spectrum(var, f_range=[1 / 48, 1 / 2])
    # reference convention: the spectrum is f^2-weighted on the
    # (physical) axis BEFORE folding, so relabeling rescales
    # amplitudes (each folded half by its own weight)
    assert len(f1) == len(f0)
    assert f1[0] == pytest.approx(1 / 48)
    assert np.isfinite(s1).all() and (s1 >= 0).all()
    assert not np.allclose(s1, s0)

    # radial binning (axis=None extension) is unweighted: pure relabel
    k0, w0 = wavenumber_spectrum(var, axis=None)
    k1, w1 = wavenumber_spectrum(var, x_range=[0.1, 2.0], axis=None)
    np.testing.assert_array_equal(w0, w1)
    assert k1[0] == pytest.approx(0.1) and k1[-1] == pytest.approx(2.0)

    # the default (reference axis=0 zonal) k^2-weights on the physical
    # axis before folding, so relabeling rescales amplitudes
    kz0, wz0 = wavenumber_spectrum(var)
    kz1, wz1 = wavenumber_spectrum(var, x_range=[0.1, 2.0])
    assert len(kz1) == len(kz0)
    assert kz1[0] == pytest.approx(0.1)
    assert np.isfinite(wz1).all() and (wz1 >= 0).all()
    assert not np.allclose(wz1, wz0)

    u = rng.random((8, 8, 4)).astype(np.float32)
    v = rng.random((8, 8, 4)).astype(np.float32)
    ft, st = tke_frequency_spectrum(u, v, f_range=[0.01, 0.5])
    assert ft[0] == pytest.approx(0.01)
    assert np.isfinite(st).all()
    kt, wt = tke_wavenumber_spectrum(u, v, x_range=[0.1, 1.0],
                                     axis=None)
    assert kt[-1] == pytest.approx(1.0)


def test_wavenumber_spectrum_axis_mode():
    """axis=0/1 give 1D zonal/meridional spectra; a field varying only
    along dim 0 has all its energy in the axis=1 spectrum."""
    from sup3r_tpu.qa.utilities import wavenumber_spectrum

    s1 = np.sin(np.linspace(0, 6 * np.pi, 16))
    var = np.repeat(s1[:, None], 16, axis=1)  # varies along dim 0 only
    k0, w_ax1 = wavenumber_spectrum(var, axis=1)  # spectrum OF dim 0
    _, w_ax0 = wavenumber_spectrum(var, axis=0)   # spectrum OF dim 1
    assert w_ax1.max() > 100 * max(w_ax0[1:].max(), 1e-12)
    assert len(k0) == 8
