"""Exec-parity for the reference QA metric library
(sup3r/qa/utilities.py): frequency/wavenumber spectra and the
direct/gradient/time-derivative distributions. Pure numpy + scipy
module — exec'd as-is and swept against sup3r_tpu.qa.utilities over
random fields and the full kwarg surface (ranges, periods, scales,
percentiles, interpolation, auto-binning).
"""

import numpy as np
import pytest

from sup3r_tpu.qa.utilities import (
    continuous_dist,
    direct_dist,
    frequency_spectrum,
    gradient_dist,
    time_derivative_dist,
    tke_frequency_spectrum,
    tke_wavenumber_spectrum,
    wavenumber_spectrum,
)

REF = '/root/reference/sup3r/qa/utilities.py'


def _load():
    import os
    if not os.path.exists(REF):
        return None
    try:
        ns = {}
        with open(REF) as f:
            exec(compile(f.read(), REF, 'exec'), ns)
        return ns
    except Exception:  # changed imports etc. -> skip, don't error collection
        return None


REF_NS = _load()
pytestmark = pytest.mark.skipif(REF_NS is None,
                                reason='reference source not available')

RNG = np.random.default_rng(42)


@pytest.mark.parametrize('f_range', [None, [1 / 48.0, 1.0]])
def test_frequency_spectrum_parity(f_range):
    var = RNG.standard_normal((5, 6, 40))
    f_ref, e_ref = REF_NS['frequency_spectrum'](var, f_range=f_range)
    f_got, e_got = frequency_spectrum(var, f_range=f_range)
    np.testing.assert_allclose(f_got, f_ref, rtol=1e-12)
    np.testing.assert_allclose(e_got, e_ref, rtol=1e-9)


@pytest.mark.parametrize('f_range', [None, [0.1, 2.0]])
def test_tke_frequency_spectrum_parity(f_range):
    u = RNG.standard_normal((4, 7, 36))
    v = RNG.standard_normal((4, 7, 36))
    f_ref, e_ref = REF_NS['tke_frequency_spectrum'](u, v, f_range=f_range)
    f_got, e_got = tke_frequency_spectrum(u, v, f_range=f_range)
    np.testing.assert_allclose(f_got, f_ref, rtol=1e-12)
    np.testing.assert_allclose(e_got, e_ref, rtol=1e-9)


@pytest.mark.parametrize('axis', [0, 1])
@pytest.mark.parametrize('x_range', [None, [1 / 100.0, 0.5]])
@pytest.mark.parametrize('shape', [(12, 16), (15, 15)])
def test_wavenumber_spectrum_parity(axis, x_range, shape):
    """Includes the DEFAULT-kwargs call: the reference defaults to the
    zonal (axis=0) spectrum, so ours must too."""
    var = RNG.standard_normal(shape)
    k_ref, e_ref = REF_NS['wavenumber_spectrum'](var, x_range=x_range,
                                                axis=axis)
    k_got, e_got = wavenumber_spectrum(var, x_range=x_range, axis=axis)
    np.testing.assert_allclose(k_got, k_ref, rtol=1e-12)
    np.testing.assert_allclose(e_got, e_ref, rtol=1e-9)
    if axis == 0 and x_range is None:
        k_d, e_d = wavenumber_spectrum(var)
        r_d, s_d = REF_NS['wavenumber_spectrum'](var)
        np.testing.assert_allclose(k_d, r_d, rtol=1e-12)
        np.testing.assert_allclose(e_d, s_d, rtol=1e-9)


@pytest.mark.parametrize('axis', [0, 1])
def test_tke_wavenumber_spectrum_parity(axis):
    u = RNG.standard_normal((10, 14))
    v = RNG.standard_normal((10, 14))
    k_ref, e_ref = REF_NS['tke_wavenumber_spectrum'](u, v, axis=axis)
    k_got, e_got = tke_wavenumber_spectrum(u, v, axis=axis)
    np.testing.assert_allclose(k_got, k_ref, rtol=1e-12)
    np.testing.assert_allclose(e_got, e_ref, rtol=1e-9)
    if axis == 0:
        _, e_d = tke_wavenumber_spectrum(u, v)
        _, s_d = REF_NS['tke_wavenumber_spectrum'](u, v)
        np.testing.assert_allclose(e_d, s_d, rtol=1e-9)


DIST_KWARGS = [
    {},
    {'bins': 25},
    {'range': (-2.0, 2.0)},
    {'diff_max': 1.5},
    {'scale': 4},
    {'percentile': 100},
    {'interpolate': True, 'bins': 60},
    {'period': 360, 'percentile': 100},
]


def _dist_parity(name, got_fn, var, **kwargs):
    c_ref, n_ref, norm_ref = REF_NS[name](var.copy(), **kwargs)
    c_got, n_got, norm_got = got_fn(var.copy(), **kwargs)
    np.testing.assert_allclose(c_got, c_ref, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(n_got, n_ref, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(norm_got, norm_ref, rtol=1e-9)


@pytest.mark.parametrize('kwargs', DIST_KWARGS)
def test_direct_dist_parity(kwargs):
    var = RNG.standard_normal((8, 9, 30))
    if kwargs.get('period'):  # winddirection-style values
        var = var * 40 + 180.0
    _dist_parity('direct_dist', direct_dist, var, **kwargs)


@pytest.mark.parametrize('kwargs', DIST_KWARGS)
def test_gradient_dist_parity(kwargs):
    var = RNG.standard_normal((8, 9, 30))
    if kwargs.get('period'):
        var = np.cumsum(var * 30, axis=1) % 360
    _dist_parity('gradient_dist', gradient_dist, var, **kwargs)


@pytest.mark.parametrize('kwargs', DIST_KWARGS)
@pytest.mark.parametrize('t_steps', [1, 3])
def test_time_derivative_dist_parity(kwargs, t_steps):
    var = RNG.standard_normal((8, 9, 30))
    if kwargs.get('period'):
        var = np.cumsum(var * 30, axis=-1) % 360
    _dist_parity('time_derivative_dist', time_derivative_dist, var,
                 t_steps=t_steps, **kwargs)


@pytest.mark.parametrize('interpolate', [False, True])
@pytest.mark.parametrize('bins', [None, 15])
def test_continuous_dist_parity(interpolate, bins):
    """Auto-binning (bins=None derives the count from the mean nonzero
    value spacing) and zero-count interpolation both match."""
    diffs = np.round(RNG.standard_normal(400), 1)  # repeated values ->
    # zero-count bins for the interpolation branch
    n_ref, c_ref = REF_NS['continuous_dist'](diffs, bins=bins,
                                             interpolate=interpolate)
    n_got, c_got = continuous_dist(diffs, bins=bins,
                                   interpolate=interpolate)
    np.testing.assert_allclose(c_got, c_ref, rtol=1e-12)
    np.testing.assert_allclose(n_got, n_ref, rtol=1e-9, atol=1e-12)


def test_continuous_dist_degenerate_guards():
    """Extension (loud-but-defined where the reference NaNs/raises):
    constant data with bins=None must not divide by a zero/NaN
    spacing, and an all-outside `range` must not 0/0 the counts."""
    counts, centers = continuous_dist(np.full(10, 3.0), bins=None)
    assert np.isfinite(counts).all() and np.isfinite(centers).all()
    counts, _ = continuous_dist(np.zeros(5), bins=4, range=(10, 12))
    assert np.isfinite(counts).all() and counts.sum() == 0.0
