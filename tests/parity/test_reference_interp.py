"""Exec-parity for the reference vertical interpolation
(sup3r/utilities/interpolation.py Interpolator) against
sup3r_tpu.ops.interp. The reference runs on dask arrays; a numpy-backed
dask stub (masked arrays included) executes it faithfully, and the
level-mask selection + linear/log interpolation are swept over random
level columns, one-sided extrapolation, NaN levels, and degenerate
(equal-height) pairs.
"""

import os
import sys
import types
import warnings

import numpy as np
import pytest

from sup3r_tpu.ops.interp import get_level_masks, interp_to_level

REF = '/root/reference/sup3r/utilities/interpolation.py'


def _np_dask_stub():
    """dask.array stand-in backed by numpy + numpy.ma (the reference
    uses only elementwise/reduction ops, map_blocks, and blockwise)."""
    dask = types.ModuleType('dask')
    da = types.ModuleType('dask.array')
    da.arange = np.arange
    da.broadcast_to = np.broadcast_to
    da.argmin = np.argmin
    da.any = np.any
    da.where = np.where
    da.isnan = np.isnan
    da.abs = np.abs
    da.map_blocks = lambda fn, *a, **k: fn(*a)

    def blockwise(fn, out_ind, *pairs, **k):
        return fn(*pairs[::2])

    da.blockwise = blockwise
    da.ma = types.SimpleNamespace(masked_array=np.ma.masked_array)
    da.core = types.SimpleNamespace(Array=np.ndarray)
    dask.array = da
    return {'dask': dask, 'dask.array': da}


def _load():
    if not os.path.exists(REF):
        return None
    stubs = _np_dask_stub()
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

RNG = np.random.default_rng(7)


def _lev_var(shape=(3, 4, 5, 6), nan_frac=0.0, base=10.0, step=25.0):
    """Random monotonic-with-jitter level columns + variable values."""
    nl = shape[-1]
    lev = (base + step * np.arange(nl)
           + RNG.uniform(-5, 5, size=shape)).astype(np.float64)
    var = RNG.standard_normal(shape)
    if nan_frac:
        mask = RNG.random(shape) < nan_frac
        # never NaN a full column (the reference raises on all-NaN)
        mask[..., -1] = False
        lev = np.where(mask, np.nan, lev)
    return lev, var


def _ref_interp(lev, var, level, method):
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')  # nanmean-of-empty etc.
        return np.asarray(REF_NS['Interpolator'].interp_to_level(
            lev, var, level, interp_kwargs={'method': method}))


def _got_interp(lev, var, level, method):
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')  # NaN-level warning
        return np.asarray(interp_to_level(lev, var, level, method=method))


@pytest.mark.parametrize('method', ['linear', 'log'])
@pytest.mark.parametrize('level', [60.0, 2.0, 500.0])
def test_interp_to_level_parity(method, level):
    """Interior interpolation plus below-all/above-all extrapolation
    (the no-candidate fallback branches of get_level_masks)."""
    lev, var = _lev_var()
    got = _got_interp(lev, var, level, method)
    ref = _ref_interp(lev, var, level, method)
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize('method', ['linear', 'log'])
def test_interp_with_nan_levels_parity(method):
    """NaN level entries (below-surface ERA5 heights) are skipped as
    candidates on both sides."""
    lev, var = _lev_var(nan_frac=0.3)
    got = _got_interp(lev, var, 60.0, method)
    ref = _ref_interp(lev, var, 60.0, method)
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-12)


def test_degenerate_equal_levels_parity():
    """Columns where the two selected levels coincide: linear takes the
    |diff|<1e-3 -> alpha=0 branch, log the h1==h0 -> coeff=0 branch."""
    lev = np.array([[[[10.0, 10.0, 10.0, 80.0]]]])
    var = np.array([[[[1.0, 2.0, 3.0, 4.0]]]])
    for method in ('linear', 'log'):
        got = _got_interp(lev, var, 10.0, method)
        ref = _ref_interp(lev, var, 10.0, method)
        np.testing.assert_allclose(got, ref, rtol=1e-12)


@pytest.mark.parametrize('level', [60.0, 2.0, 500.0])
def test_level_mask_parity(level):
    """The boolean below/above selection masks are identical."""
    lev, _ = _lev_var(shape=(4, 5, 7))
    levs = np.ma.masked_array(lev, np.isnan(lev))
    m1_ref, m2_ref = REF_NS['Interpolator'].get_level_masks(levs, level)
    m1, m2 = get_level_masks(lev, level)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m1_ref))
    np.testing.assert_array_equal(np.asarray(m2), np.asarray(m2_ref))


def test_level_mask_parity_with_nans():
    lev, _ = _lev_var(shape=(4, 5, 7), nan_frac=0.4)
    levs = np.ma.masked_array(lev, np.isnan(lev))
    m1_ref, m2_ref = REF_NS['Interpolator'].get_level_masks(levs, 60.0)
    m1, m2 = get_level_masks(lev, 60.0)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m1_ref))
    np.testing.assert_array_equal(np.asarray(m2), np.asarray(m2_ref))
