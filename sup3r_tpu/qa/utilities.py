"""QA metrics: spectra and distributions for super-resolved output.

Reference parity: sup3r/qa/utilities.py:10-345.
"""

import numpy as np


def tke_frequency_spectrum(u, v, f_range=None):
    """Turbulent kinetic energy spectrum over frequency (time axis
    last). Returns mean |FFT(0.5(u'^2+v'^2))|^2-style amplitude."""
    v_f = np.fft.fftfreq(u.shape[-1])
    u_f = np.abs(np.fft.fft(u, axis=-1)) ** 2
    v_f2 = np.abs(np.fft.fft(v, axis=-1)) ** 2
    spectrum = 0.5 * (u_f + v_f2)
    spectrum = spectrum.reshape(-1, spectrum.shape[-1]).mean(axis=0)
    freq = np.fft.fftfreq(u.shape[-1])
    pos = freq > 0
    return freq[pos], spectrum[pos]


def frequency_spectrum(var, f_range=None):
    """Mean power spectrum along the time axis (last axis)."""
    spec = np.abs(np.fft.fft(var, axis=-1)) ** 2
    spec = spec.reshape(-1, spec.shape[-1]).mean(axis=0)
    freq = np.fft.fftfreq(var.shape[-1])
    pos = freq > 0
    return freq[pos], spec[pos]


def wavenumber_spectrum(var, x_range=None):
    """Radially-binned 2D spatial power spectrum of (s1, s2[, t])
    data (mean over any trailing axes)."""
    if var.ndim == 3:
        var = var.mean(axis=-1)
    spec2d = np.abs(np.fft.fft2(var)) ** 2
    s1, s2 = var.shape
    k1 = np.fft.fftfreq(s1) * s1
    k2 = np.fft.fftfreq(s2) * s2
    kmag = np.hypot(*np.meshgrid(k1, k2, indexing='ij'))
    kbins = np.arange(1, int(min(s1, s2) / 2) + 1)
    spectrum = np.array([
        spec2d[(kmag >= k - 0.5) & (kmag < k + 0.5)].mean()
        for k in kbins])
    return kbins, spectrum


def tke_wavenumber_spectrum(u, v, x_range=None, axis=0):
    """Radial spatial spectrum of turbulent kinetic energy."""
    k, su = wavenumber_spectrum(u)
    _, sv = wavenumber_spectrum(v)
    return k, 0.5 * (su + sv)


def direct_dist(var, bins=40, range=None, diff_max=None, scale=1,
                percentile=99.9, interpolate=False, period=None):
    """Histogram of raw values (normalized counts)."""
    var = np.asarray(var).ravel() / scale
    if range is None:
        bound = np.percentile(np.abs(var[np.isfinite(var)]), percentile)
        range = (-bound, bound) if (var < 0).any() else (0, bound)
    counts, edges = np.histogram(var[np.isfinite(var)], bins=bins,
                                 range=range, density=True)
    centers = 0.5 * (edges[:-1] + edges[1:])
    return centers, counts, float(np.nanmean(var)), float(
        np.nanstd(var))


def gradient_dist(var, bins=40, range=None, diff_max=None, scale=1,
                  percentile=99.9, interpolate=False, period=None):
    """Histogram of spatial gradients (first spatial axis)."""
    diffs = np.diff(np.asarray(var, dtype=np.float64), axis=0).ravel()
    diffs = diffs / scale
    if diff_max is not None:
        diffs = diffs[np.abs(diffs) < diff_max]
    return direct_dist(diffs, bins=bins, range=range,
                       percentile=percentile)


def time_derivative_dist(var, bins=40, range=None, diff_max=None,
                         t_steps=1, scale=1, percentile=99.9,
                         interpolate=False, period=None):
    """Histogram of temporal derivatives (last axis)."""
    diffs = np.diff(np.asarray(var, dtype=np.float64), n=1,
                    axis=-1)[..., ::t_steps].ravel() / scale
    if diff_max is not None:
        diffs = diffs[np.abs(diffs) < diff_max]
    return direct_dist(diffs, bins=bins, range=range,
                       percentile=percentile)


def continuous_dist(diffs, bins=None, range=None, interpolate=False,
                    period=None):
    """Simple continuous histogram wrapper."""
    return direct_dist(np.asarray(diffs), bins=bins or 40, range=range)
