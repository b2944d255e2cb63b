"""Native (C++) host-side kernels with automatic build + numpy
fallback.

The compute path of sup3r_tpu is JAX/XLA/Pallas on the TPU; this
module owns the *host* hot loops around it: chunk boundary padding,
flattened-H5 gather/scale/transpose, and IDW regrid application. All
entry points transparently fall back to numpy when the shared library
is unavailable (e.g. no compiler).

Build explicitly with ``python -m sup3r_tpu._native.build`` or let the
first import attempt it.
"""

import ctypes
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, 'chunk_prep.cpp')
_LIB = os.path.join(_DIR, 'libchunk_prep.so')

_lib = None


def build(force=False):
    """Compile the shared library with g++ -O3 -march=native."""
    if os.path.exists(_LIB) and not force and (
            os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
        return _LIB
    # write-to-temp + atomic rename: N pipeline node subprocesses can
    # race this build on a shared filesystem — a peer must never CDLL
    # a partially written .so (same pattern as the exo-cache writes)
    tmp = f'{_LIB}.{os.getpid()}.tmp'
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', '-pthread',
           _SRC, '-o', tmp]
    logger.info('Building native chunk_prep: %s', ' '.join(cmd))
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, _LIB)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return _LIB


def _load():
    global _lib
    if _lib is not None:
        return _lib
    try:
        build()
        lib = ctypes.CDLL(_LIB)
    except Exception as e:  # no compiler / unsupported platform
        logger.warning('Native chunk_prep unavailable (%s); using '
                       'numpy fallbacks', e)
        _lib = False
        return _lib

    i64 = ctypes.c_int64
    f32p = np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS')
    u16p = np.ctypeslib.ndpointer(np.uint16, flags='C_CONTIGUOUS')
    i64p = np.ctypeslib.ndpointer(np.int64, flags='C_CONTIGUOUS')
    lib.reflect_pad_4d.argtypes = [f32p, f32p] + [i64] * 10
    lib.gather_scale_transpose_u16.argtypes = [
        u16p, i64p, f32p, i64, i64, i64, ctypes.c_float]
    lib.gather_scale_transpose_f32.argtypes = [
        f32p, i64p, f32p, i64, i64, i64, ctypes.c_float]
    lib.idw_apply.argtypes = [f32p, i64p, f32p, f32p, i64, i64, i64]
    _lib = lib
    return _lib


def available():
    """Whether the native library is loadable."""
    return bool(_load())


def reflect_pad_4d(arr, pad_width):
    """np.pad(arr, (*pad_width, (0, 0)), mode='reflect') for a 4D
    float32 (s1, s2, t, f) array, multithreaded."""
    lib = _load()
    arr = np.ascontiguousarray(arr, dtype=np.float32)
    (p1a, p1b), (p2a, p2b), (pta, ptb) = pad_width
    if not lib:
        return np.pad(arr, (*pad_width, (0, 0)), mode='reflect')
    s1, s2, t, f = arr.shape
    out = np.empty((s1 + p1a + p1b, s2 + p2a + p2b, t + pta + ptb, f),
                   dtype=np.float32)
    lib.reflect_pad_4d(arr, out, s1, s2, t, f, p1a, p1b, p2a, p2b,
                       pta, ptb)
    return out


def gather_scale_transpose(src, gids, scale=1.0):
    """(time, n_sites) block + gid columns -> (n_gids, time) float32
    scaled by 1/scale (the flattened-H5 read hot loop)."""
    lib = _load()
    gids = np.ascontiguousarray(gids, dtype=np.int64)
    if not lib or src.dtype not in (np.uint16, np.float32):
        return (src[:, gids].T.astype(np.float32) / scale)
    src = np.ascontiguousarray(src)
    t, n_total = src.shape
    out = np.empty((len(gids), t), dtype=np.float32)
    if src.dtype == np.uint16:
        lib.gather_scale_transpose_u16(src, gids, out, t, n_total,
                                       len(gids), 1.0 / scale)
    else:
        lib.gather_scale_transpose_f32(src, gids, out, t, n_total,
                                       len(gids), 1.0 / scale)
    return out


def idw_apply(src, idx, weights):
    """out[n] = sum_k weights[n, k] * src[idx[n, k]] over trailing
    dims; src (n_src, ...), idx/weights (n_out, k)."""
    lib = _load()
    src2 = np.ascontiguousarray(
        src.reshape(src.shape[0], -1), dtype=np.float32)
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    weights = np.ascontiguousarray(weights, dtype=np.float32)
    if not lib:
        out = np.einsum('nk,nk...->n...', weights, src[idx])
        return out.astype(np.float32)
    n_out, k = idx.shape
    out = np.empty((n_out, src2.shape[1]), dtype=np.float32)
    lib.idw_apply(src2, idx, weights, out, n_out, k, src2.shape[1])
    return out.reshape(n_out, *src.shape[1:])
