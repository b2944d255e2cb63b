"""Loss semantic properties (mirrors reference
tests/utilities/test_loss_metrics.py:26-300): MMD distribution
sensitivity, coarse-MSE scale separation, extremes dominance for both
signs, FFT spectrum sensitivity, and material-derivative advection
sensitivity."""

import numpy as np
import pytest

from sup3r_tpu.ops.losses import (
    coarse_mse_loss,
    material_derivative_loss,
    mmd_loss,
    mmd_mse_loss,
    mse,
    spatial_extremes_loss,
    spatial_fft_loss,
    spatiotemporal_fft_loss,
    temporal_extremes_loss,
)
from sup3r_tpu.utilities import RANDOM_GENERATOR


def test_mmd_distribution_sensitivity():
    """Shifted peaks: mmd adds signal over mse; rescaled identical
    distribution: mmd adds little (reference:
    test_loss_metrics.py:26-53)."""
    x = np.zeros((6, 10, 10, 8, 3), np.float32)
    y = np.zeros((6, 10, 10, 8, 3), np.float32)
    x[:, 7:9, 7:9] = 1
    y[:, 2:5, 2:5] = 1
    base = float(mse(x, y))
    combined = (float(mmd_loss(x, y)) + base) / 2
    assert combined > base

    x = RANDOM_GENERATOR.random((6, 10, 10, 8, 3)).astype(np.float32)
    x /= x.max()
    base = float(mse(5 * x, x))
    combined = (float(mmd_loss(5 * x, x)) + base) / 2
    assert combined < base


def test_coarse_mse_much_smaller_for_zero_mean_noise():
    """Spatial averaging kills iid noise: coarse MSE << pointwise MSE
    (reference: test_loss_metrics.py:56-71)."""
    x = RANDOM_GENERATOR.uniform(0, 1, (6, 10, 10, 8, 3)).astype(
        np.float32)
    y = RANDOM_GENERATOR.uniform(0, 1, (6, 10, 10, 8, 3)).astype(
        np.float32)
    assert float(mse(x, y)) > 10 * float(coarse_mse_loss(x, y))


@pytest.mark.parametrize('sign', [1.0, -1.0])
def test_temporal_extremes_dominate(sign):
    x = np.zeros((1, 1, 1, 72, 1), np.float32)
    y = np.zeros((1, 1, 1, 72, 1), np.float32)
    x[..., 24, 0] = sign * 20
    y[..., 25, 0] = sign * 25
    assert float(temporal_extremes_loss(x, y)) > 1.5


@pytest.mark.parametrize('sign', [1.0, -1.0])
def test_spatial_extremes_dominate(sign):
    x = np.zeros((1, 10, 10, 2, 1), np.float32)
    y = np.zeros((1, 10, 10, 2, 1), np.float32)
    x[:, 5, 5, :, 0] = sign * 20
    y[:, 5, 5, :, 0] = sign * 25
    assert float(spatial_extremes_loss(x, y)) > 1.5


def test_fft_loss_detects_spectrum_shift():
    """Smoothing a field changes its spectrum: fft loss between raw
    and smoothed exceeds fft loss between two same-spectrum noises
    (reference: test_loss_metrics.py:144-172)."""
    x = RANDOM_GENERATOR.random((2, 16, 16, 1)).astype(np.float32)
    y = RANDOM_GENERATOR.random((2, 16, 16, 1)).astype(np.float32)
    # heavy smoothing = spectrum tilted to low frequencies
    sm = x.copy()
    for _ in range(8):
        sm = 0.5 * sm + 0.25 * (np.roll(sm, 1, axis=1)
                                + np.roll(sm, 1, axis=2))
    same_spec = float(spatial_fft_loss(x, y))
    diff_spec = float(spatial_fft_loss(x, sm))
    assert diff_spec > same_spec

    x5 = RANDOM_GENERATOR.random((2, 16, 16, 8, 1)).astype(np.float32)
    y5 = RANDOM_GENERATOR.random((2, 16, 16, 8, 1)).astype(np.float32)
    sm5 = x5.copy()
    for _ in range(8):
        sm5 = 0.5 * sm5 + 0.25 * (np.roll(sm5, 1, axis=1)
                                  + np.roll(sm5, 1, axis=2))
    assert float(spatiotemporal_fft_loss(x5, sm5)) > float(
        spatiotemporal_fft_loss(x5, y5))


def test_material_derivative_sensitive_to_advection():
    """Fields identical except in du/dt along the flow register a
    larger MD loss than plain noise of the same magnitude (reference:
    test_loss_metrics.py:263-290)."""
    base = RANDOM_GENERATOR.random((2, 8, 8, 12, 2)).astype(np.float32)
    # advecting pattern: roll over time
    moving = np.stack([np.roll(base[..., 0], t, axis=3)
                       for t in range(1)], -1)
    x = base
    y = base.copy()
    y[..., 0] = np.roll(y[..., 0], 2, axis=3)  # time-shifted component
    noise = base + 0.01 * RANDOM_GENERATOR.standard_normal(
        base.shape).astype(np.float32)
    md_shift = float(material_derivative_loss(x, y))
    md_noise = float(material_derivative_loss(x, noise))
    assert md_shift > md_noise


def test_mmd_mse_combination_is_sum_like():
    x = RANDOM_GENERATOR.random((2, 8, 8, 4, 1)).astype(np.float32)
    y = RANDOM_GENERATOR.random((2, 8, 8, 4, 1)).astype(np.float32)
    combo = float(mmd_mse_loss(x, y))
    assert combo >= float(mse(x, y)) * 0.5


def test_derivative_losses_detect_gradient_mismatch():
    """Derivative losses respond to sharpened gradients more than to a
    constant offset (which leaves derivatives untouched) — reference:
    sup3r/utilities/loss_metrics.py:228-296."""
    from sup3r_tpu.ops.losses import (
        spatial_derivative_loss,
        temporal_derivative_loss,
    )

    x = RANDOM_GENERATOR.random((2, 12, 12, 8, 2)).astype(np.float32)
    offset = x + 1.0          # derivatives identical
    sharp = x * 3.0           # derivatives scaled 3x
    assert float(spatial_derivative_loss(x, offset)) < 1e-6
    assert float(temporal_derivative_loss(x, offset)) < 1e-6
    assert float(spatial_derivative_loss(x, sharp)) > 1e-3
    assert float(temporal_derivative_loss(x, sharp)) > 1e-3


def test_exp_loss_matches_reference_form():
    """ExpLoss is mean(1 - exp(-(x1-x2)^2)): bounded in [0, 1) and
    saturating for large errors (reference:
    sup3r/utilities/loss_metrics.py:98-118)."""
    from sup3r_tpu.ops.losses import exp_loss

    x = np.zeros((2, 8, 8, 1), np.float32)
    np.testing.assert_allclose(float(exp_loss(x, x + 0.1)),
                               1 - np.exp(-0.01), rtol=1e-5)
    np.testing.assert_allclose(float(exp_loss(x, x + 2.0)),
                               1 - np.exp(-4.0), rtol=1e-5)
    assert float(exp_loss(x, x + 100.0)) <= 1.0  # saturates


def test_loss_registry_every_name_resolves_and_runs():
    """Every LOSS_REGISTRY name resolves through get_loss_fun and
    produces a finite scalar on well-shaped 5D data (reference name
    resolution: sup3r/models/abstract.py:461-541)."""
    from sup3r_tpu.ops.losses import LOSS_REGISTRY, get_loss_fun

    x = RANDOM_GENERATOR.random((2, 12, 12, 8, 2)).astype(np.float32)
    y = RANDOM_GENERATOR.random((2, 12, 12, 8, 2)).astype(np.float32)
    for name in LOSS_REGISTRY:
        if name == 'LowResLoss':
            fn = get_loss_fun({name: {'s_enhance': 2, 't_enhance': 2}})
        elif name == 'PerceptualLoss':
            continue  # needs its feature-extractor checkpoint; has
            # dedicated tests in tests/utilities/test_misc_components
        else:
            fn = get_loss_fun(name)
        try:
            val = float(fn(x, y))
        except (TypeError, ValueError, AssertionError):
            # spatial-only losses take 4D (n, s1, s2, f) input
            val = float(fn(x[..., 0, :], y[..., 0, :]))
        assert np.isfinite(val), name
        assert val >= 0, name
    # weighted multi-term spec
    fn = get_loss_fun([('MeanAbsoluteError', 0.5),
                       ('SpatialExtremesLoss', 0.5)])
    assert np.isfinite(float(fn(x, y)))
    # unknown names are loud
    with pytest.raises(KeyError):
        get_loss_fun('NotALoss')
