"""Native C++ host kernels: exactness vs numpy (fallback-safe)."""

import numpy as np

from sup3r_tpu._native import (
    available,
    gather_scale_transpose,
    idw_apply,
    reflect_pad_4d,
)

RNG = np.random.default_rng(5)


def test_reflect_pad_4d_matches_numpy():
    arr = RNG.random((10, 12, 14, 3)).astype(np.float32)
    for pads in [((1, 1), (1, 1), (1, 1)), ((3, 2), (0, 4), (2, 0)),
                 ((0, 0), (0, 0), (0, 0))]:
        out = reflect_pad_4d(arr, pads)
        ref = np.pad(arr, (*pads, (0, 0)), mode='reflect')
        np.testing.assert_array_equal(out, ref)


def test_gather_scale_transpose_matches_numpy():
    src = (RNG.random((50, 200)) * 2000).astype(np.uint16)
    gids = RNG.choice(200, 64, replace=False)
    out = gather_scale_transpose(src, gids, scale=100.0)
    ref = src[:, gids].T.astype(np.float32) / 100.0
    np.testing.assert_allclose(out, ref, atol=1e-5)

    srcf = RNG.random((50, 200)).astype(np.float32)
    out_f = gather_scale_transpose(srcf, gids, scale=2.0)
    np.testing.assert_allclose(out_f, srcf[:, gids].T / 2.0, atol=1e-6)


def test_idw_apply_matches_numpy():
    src = RNG.random((100, 16)).astype(np.float32)
    idx = RNG.integers(0, 100, (40, 4))
    w = RNG.random((40, 4)).astype(np.float32)
    out = idw_apply(src, idx, w)
    ref = np.einsum('nk,nkm->nm', w, src[idx])
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_native_reports_availability():
    # just exercises the build/load path; numpy fallback also valid
    assert available() in (True, False)
