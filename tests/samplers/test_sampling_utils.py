"""Sampling utilities (mirrors reference
tests/utilities/test_utilities.py:99-226): weighted box/time samplers
concentrate draws in the weighted bins, uniform samplers cover the
valid range, and degenerate weights fall back safely."""

import numpy as np
import pytest

from sup3r_tpu.preprocessing.samplers import (
    _safe_probs,
    uniform_box_sampler,
    uniform_time_sampler,
    weighted_box_sampler,
    weighted_time_sampler,
)

DATA_SHAPE = (20, 20, 100)


def test_uniform_box_sampler_in_range():
    for _ in range(50):
        s1, s2 = uniform_box_sampler(DATA_SHAPE, (8, 8))
        assert 0 <= s1.start and s1.stop <= 20
        assert 0 <= s2.start and s2.stop <= 20
        assert s1.stop - s1.start == 8
        assert s2.stop - s2.start == 8


def test_uniform_box_sampler_clamps_big_sample():
    s1, s2 = uniform_box_sampler((5, 5, 10), (8, 8))
    assert (s1.start, s1.stop) == (0, 5)
    assert (s2.start, s2.stop) == (0, 5)


def test_uniform_time_sampler_in_range():
    for _ in range(50):
        t = uniform_time_sampler(DATA_SHAPE, 10)
        assert 0 <= t.start and t.stop <= 100
        assert t.stop - t.start == 10


def test_uniform_time_sampler_crop_slice():
    for _ in range(50):
        t = uniform_time_sampler(DATA_SHAPE, 5,
                                 crop_slice=slice(40, 60))
        assert 40 <= t.start and t.stop <= 60


def test_weighted_time_sampler_concentrates():
    """All weight on the last temporal bin -> every start lands in its
    range (reference: test_utilities.py:167-203)."""
    weights = np.zeros(10)
    weights[-1] = 1.0
    starts = [weighted_time_sampler(DATA_SHAPE, 5, weights).start
              for _ in range(60)]
    # last bin of range(96) chunked by 9: starts >= 9*9=81
    assert min(starts) >= 80
    weights = np.zeros(10)
    weights[0] = 1.0
    starts = [weighted_time_sampler(DATA_SHAPE, 5, weights).start
              for _ in range(60)]
    assert max(starts) < 15


def test_weighted_time_sampler_shape_one():
    """sample_shape 1 uses every timestep as a candidate start."""
    weights = np.zeros(4)
    weights[-1] = 1.0
    starts = [weighted_time_sampler(DATA_SHAPE, 1, weights).start
              for _ in range(40)]
    assert min(starts) >= 75
    assert max(starts) <= 99


def test_weighted_box_sampler_concentrates():
    """Weight on the first spatial chunk keeps crops near the origin
    (reference: test_utilities.py:99-164)."""
    weights = np.zeros(4)
    weights[0] = 1.0
    for _ in range(40):
        s1, s2 = weighted_box_sampler(DATA_SHAPE, (4, 4), weights)
        flat = s1.start * (20 - 4 + 1) + s2.start
        assert flat < (17 * 17) // 4 + 1
    weights = np.zeros(4)
    weights[-1] = 1.0
    for _ in range(40):
        s1, s2 = weighted_box_sampler(DATA_SHAPE, (4, 4), weights)
        flat = s1.start * (20 - 4 + 1) + s2.start
        assert flat >= 3 * ((17 * 17) // 4)


def test_weighted_samplers_match_data_bounds():
    for _ in range(30):
        s1, s2 = weighted_box_sampler(DATA_SHAPE, (8, 8),
                                      np.ones(16) / 16)
        assert s1.stop <= 20 and s2.stop <= 20
        t = weighted_time_sampler(DATA_SHAPE, 10, np.ones(8) / 8)
        assert t.stop <= 100


def test_safe_probs_normalizes_fp32():
    """fp32 weights whose sum misses 1.0 at np.random's tolerance are
    renormalized in float64 (the bug class fixed in round 1)."""
    w = np.float32(1.0) / np.float32(3.0) * np.ones(3, np.float32)
    p = _safe_probs(w)
    assert p.dtype == np.float64
    np.testing.assert_allclose(p.sum(), 1.0, rtol=0, atol=1e-15)


def test_safe_probs_degenerate_fallbacks():
    np.testing.assert_allclose(_safe_probs([0, 0, 0]),
                               np.full(3, 1 / 3))
    np.testing.assert_allclose(_safe_probs([np.nan, np.nan]),
                               np.full(2, 1 / 2))
    np.testing.assert_allclose(_safe_probs([-1, 2.0]), [0.0, 1.0])


def test_bad_enhancement_factors_raise_at_construction():
    """Non-divisible enhancement factors fail at handler construction
    with a clear message, not later in the producer thread (reference:
    tests/batch_queues/test_bq_general.py:208-282)."""
    from sup3r_tpu.preprocessing.batch_handlers import BatchHandler
    from sup3r_tpu.utilities.test_helpers import make_fake_dset

    data = make_fake_dset((12, 12, 24), ['u_100m'])
    with pytest.raises(AssertionError, match='s_enhance'):
        BatchHandler([data], batch_size=1, n_batches=1, s_enhance=3,
                     t_enhance=1, sample_shape=(8, 8, 1))
    with pytest.raises(AssertionError, match='t_enhance'):
        BatchHandler([data], batch_size=1, n_batches=1, s_enhance=2,
                     t_enhance=2, sample_shape=(8, 8, 1))
    with pytest.raises(AssertionError, match='t_enhance'):
        BatchHandler([data], batch_size=1, n_batches=1, s_enhance=2,
                     t_enhance=3, sample_shape=(8, 8, 4))


def test_nsrdb_reduce_daily_centers_daylight():
    """Reducing a 24h solar batch keeps a window centered on the
    daylight hours: small windows are all-finite, large windows keep
    night NaNs at BOTH edges (reference:
    tests/samplers/test_cc.py:195-233 nsrdb_sub_daily_sampler)."""
    from sup3r_tpu.preprocessing.samplers import (
        nsrdb_reduce_daily_data,
    )

    t = 24
    csr = np.full((1, 4, 4, t, 1), np.nan, np.float32)
    # daylight 8:00-16:00 (8 finite hours)
    csr[:, :, :, 8:16, :] = 0.7

    small = nsrdb_reduce_daily_data(csr, 4, csr_ind=0)
    assert small.shape[3] == 4
    assert np.isfinite(small).all()

    eight = nsrdb_reduce_daily_data(csr, 8, csr_ind=0)
    assert eight.shape[3] == 8
    assert np.isfinite(eight).all()

    wide = nsrdb_reduce_daily_data(csr, 20, csr_ind=0)
    assert wide.shape[3] == 20
    finite_t = np.isfinite(wide[0, 0, 0, :, 0])
    assert finite_t.sum() == 8
    assert not finite_t[:3].any(), 'leading night hours expected'
    assert not finite_t[-3:].any(), 'trailing night hours expected'

    # all-night day: returned unreduced (callers center-crop)
    night = np.full((1, 4, 4, t, 1), np.nan, np.float32)
    assert nsrdb_reduce_daily_data(night, 8, csr_ind=0).shape[3] == t
