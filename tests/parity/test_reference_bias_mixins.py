"""Exec-parity for the reference bias mixins (sup3r/bias/mixins.py):
FillAndSmoothMixin.fill_and_smooth (NN fill + extension/interior
gaussian smoothing of calibration factor rasters) and
ZeroRateMixin.zero_precipitation_rate. The reference module needs only
scipy + nn_fill_array (stubbed with ours, itself exec-parity-proven
bit-identical in test_reference_numerics.py).
"""

import os
import sys
import types
import warnings

import numpy as np
import pytest

from sup3r_tpu.bias.bias_calc import FillAndSmoothMixin
from sup3r_tpu.bias.presrat import zero_precipitation_rate
from sup3r_tpu.utilities.utilities import nn_fill_array

REF = '/root/reference/sup3r/bias/mixins.py'


def _load():
    if not os.path.exists(REF):
        return None
    sup3r_mod = types.ModuleType('sup3r')
    utils_pkg = types.ModuleType('sup3r.utilities')
    utils = types.ModuleType('sup3r.utilities.utilities')
    utils.nn_fill_array = nn_fill_array
    stubs = {'sup3r': sup3r_mod, 'sup3r.utilities': utils_pkg,
             'sup3r.utilities.utilities': utils}
    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    try:
        ns = {'__file__': REF}
        with open(REF) as f:
            exec(compile(f.read(), REF, 'exec'), ns)
        return ns
    except Exception:  # changed imports etc. -> skip, don't error
        return None
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


REF_NS = _load()
pytestmark = pytest.mark.skipif(REF_NS is None,
                                reason='reference source not available')

RNG = np.random.default_rng(13)


def _factor_dict(nt=3):
    """Factor rasters with a NaN extension band (the out-of-base-extent
    region every per-timestep layer shares, as bias calc produces)."""
    out = {}
    for key in ('f_scalar', 'f_adder'):
        arr = RNG.standard_normal((12, 10, nt))
        arr[:3, :, :] = np.nan     # extension band: all layers NaN
        arr[:, -2:, :] = np.nan
        out[key] = arr
    return out


def _ref_mixin():
    obj = REF_NS['FillAndSmoothMixin']()
    obj.bad_bias_gids = []
    return obj


@pytest.mark.parametrize('fill_extend', [True, False])
@pytest.mark.parametrize('smooth_extend', [0, 1.5])
@pytest.mark.parametrize('smooth_interior', [0, 1.2])
def test_fill_and_smooth_parity(fill_extend, smooth_extend,
                                smooth_interior):
    """Full flag matrix — including smooth_interior>0 with
    fill_extend=False (the reference still NN-fills there so interior
    smoothing can't pull NaNs across the boundary) and both smoothings
    together (ext and interior variants are both computed from the same
    FILLED layer, not from each other's output)."""
    src = _factor_dict()
    ref_out = _ref_mixin().fill_and_smooth(
        {k: v.copy() for k, v in src.items()}, fill_extend=fill_extend,
        smooth_extend=smooth_extend, smooth_interior=smooth_interior)
    got_out = FillAndSmoothMixin().fill_and_smooth(
        {k: v.copy() for k, v in src.items()}, fill_extend=fill_extend,
        smooth_extend=smooth_extend, smooth_interior=smooth_interior)
    for key in src:
        np.testing.assert_allclose(got_out[key], ref_out[key],
                                   rtol=1e-12, atol=0, equal_nan=True)


def test_fill_and_smooth_no_nan_parity():
    """No extension band at all: layers pass through (up to interior
    smoothing) identically."""
    src = {'f': RNG.standard_normal((8, 8, 2))}
    ref_out = _ref_mixin().fill_and_smooth(
        {k: v.copy() for k, v in src.items()}, smooth_interior=0.8)
    got_out = FillAndSmoothMixin().fill_and_smooth(
        {k: v.copy() for k, v in src.items()}, smooth_interior=0.8)
    np.testing.assert_allclose(got_out['f'], ref_out['f'], rtol=1e-12)


@pytest.mark.parametrize('threshold', [0.0, 0.01, 1.0])
def test_zero_precipitation_rate_parity(threshold):
    arr = np.concatenate([np.zeros(5), RNG.random(20), [np.nan] * 4])
    ref = REF_NS['ZeroRateMixin'].zero_precipitation_rate(arr, threshold)
    got = zero_precipitation_rate(arr, threshold)
    np.testing.assert_allclose(got, ref, rtol=1e-12)


def test_zero_precipitation_rate_all_nan_matches():
    arr = np.full(6, np.nan)
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')  # reference: mean of empty
        ref = REF_NS['ZeroRateMixin'].zero_precipitation_rate(arr)
    assert np.isnan(ref) and np.isnan(zero_precipitation_rate(arr))
