"""Slicer parity: execute the REFERENCE slicer source (read-only, with
its sup3r imports stubbed) and verify our slicer produces bit-identical
slice grids across a parameter sweep. This is the correctness heart of
chunk stitching (SURVEY 'hard parts' #1)."""

import os
import sys
import types
import warnings

import numpy as np
import pytest

from sup3r_tpu.pipeline.slicer import ForwardPassSlicer, get_chunk_slices

REF_SLICER = '/root/reference/sup3r/pipeline/slicer.py'


def _load_reference_slicer():
    """Exec the reference slicer module with stub dependencies."""
    if not os.path.exists(REF_SLICER):
        return None

    def ref_get_chunk_slices(arr_size, chunk_size,
                             index_slice=slice(None)):
        indices = np.arange(0, arr_size)
        indices = indices[slice(index_slice.start, index_slice.stop)]
        return [
            slice(indices[i], indices[min(i + chunk_size,
                                          len(indices) - 1)] + 1
                  if i + chunk_size >= len(indices)
                  else indices[i + chunk_size])
            for i in range(0, len(indices), chunk_size)
        ]

    def _parse_time_slice(value):
        if value is None:
            return slice(None)
        if isinstance(value, slice):
            return value
        return slice(*value)

    def log_args(func):
        return func

    pipeline_utils = types.ModuleType('sup3r.pipeline.utilities')
    pipeline_utils.get_chunk_slices = ref_get_chunk_slices
    prep_utils = types.ModuleType('sup3r.preprocessing.utilities')
    prep_utils._parse_time_slice = _parse_time_slice
    prep_utils.log_args = log_args
    sup3r_mod = types.ModuleType('sup3r')
    pipeline_mod = types.ModuleType('sup3r.pipeline')
    prep_mod = types.ModuleType('sup3r.preprocessing')
    mods = {
        'sup3r': sup3r_mod,
        'sup3r.pipeline': pipeline_mod,
        'sup3r.pipeline.utilities': pipeline_utils,
        'sup3r.preprocessing': prep_mod,
        'sup3r.preprocessing.utilities': prep_utils,
    }
    saved = {k: sys.modules.get(k) for k in mods}
    sys.modules.update(mods)
    try:
        namespace = {}
        with open(REF_SLICER) as f:
            exec(compile(f.read(), REF_SLICER, 'exec'), namespace)
        return namespace['ForwardPassSlicer']
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


RefSlicer = _load_reference_slicer()

SWEEP = [
    # coarse_shape, time_steps, s_enh, t_enh, time_slice, t_pad, s_pad,
    # chunk_shape
    ((10, 10), 20, 2, 1, slice(None), 0, 0, (5, 5, 10)),
    ((10, 10), 20, 3, 4, slice(None), 1, 1, (5, 5, 6)),
    ((12, 18), 37, 3, 4, slice(2, 30), 2, 3, (7, 5, 8)),
    ((8, 8), 24, 2, 2, slice(None), 1, 1, (7, 7, 9)),  # tiny last slice
    ((9, 7), 11, 5, 3, slice(1, None, 1), 2, 2, (4, 3, 4)),
    ((20, 20), 48, 4, 24, slice(None), 1, 1, (6, 6, 12)),
    ((5, 5), 10, 2, 1, slice(None), 3, 3, (2, 2, 3)),
]


@pytest.mark.skipif(RefSlicer is None, reason='reference not mounted')
@pytest.mark.parametrize('params', SWEEP)
def test_slicer_parity_with_reference(params):
    (coarse_shape, t_steps, s_enh, t_enh, t_slice, t_pad, s_pad,
     chunk_shape) = params
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        ref = RefSlicer(
            coarse_shape=coarse_shape, time_steps=t_steps,
            s_enhance=s_enh, t_enhance=t_enh, time_slice=t_slice,
            temporal_pad=t_pad, spatial_pad=s_pad,
            chunk_shape=chunk_shape)
        mine = ForwardPassSlicer(
            coarse_shape=coarse_shape, time_steps=t_steps,
            s_enhance=s_enh, t_enhance=t_enh, time_slice=t_slice,
            temporal_pad=t_pad, spatial_pad=s_pad,
            chunk_shape=chunk_shape)

        assert ref.n_chunks == mine.n_chunks
        assert ref.n_spatial_chunks == mine.n_spatial_chunks
        assert ref.n_time_chunks == mine.n_time_chunks
        assert list(ref.s_lr_slices) == list(mine.s_lr_slices)
        assert list(ref.s_lr_pad_slices) == list(mine.s_lr_pad_slices)
        assert list(ref.t_lr_slices) == list(mine.t_lr_slices)
        assert list(ref.t_lr_pad_slices) == list(mine.t_lr_pad_slices)
        assert list(ref.t_lr_crop_slices) == list(mine.t_lr_crop_slices)
        assert list(ref.s_lr_crop_slices) == list(mine.s_lr_crop_slices)
        assert list(ref.s_hr_slices) == list(mine.s_hr_slices)
        assert list(ref.s_hr_crop_slices) == list(mine.s_hr_crop_slices)
        assert list(ref.t_hr_crop_slices) == list(mine.t_hr_crop_slices)
        for t_idx in range(ref.n_time_chunks):
            assert (list(ref.hr_crop_slices[t_idx])
                    == list(mine.hr_crop_slices[t_idx]))
        assert ref.extra_padding == mine.extra_padding
        np.testing.assert_array_equal(ref.chunk_lookup,
                                      mine.chunk_lookup)


def test_chunk_slices_cover_domain():
    slices = get_chunk_slices(17, 5)
    assert slices[0] == slice(0, 5)
    assert slices[-1] == slice(15, 17)
    covered = np.concatenate([np.arange(s.start, s.stop)
                              for s in slices])
    np.testing.assert_array_equal(covered, np.arange(17))


def test_stitching_covers_hr_domain_exactly():
    """Placing cropped outputs at hr placement slices tiles the domain
    exactly once."""
    slicer = ForwardPassSlicer(
        coarse_shape=(11, 13), time_steps=17, s_enhance=3, t_enhance=2,
        time_slice=slice(None), temporal_pad=2, spatial_pad=2,
        chunk_shape=(4, 5, 6), min_width=(4, 4, 4))
    hr_shape = (11 * 3, 13 * 2 * 0 + 13 * 3, 17 * 2)
    counts = np.zeros(hr_shape)
    for t_idx, t_slice in enumerate(slicer.t_lr_slices):
        hr_t = slice(t_slice.start * 2, t_slice.stop * 2)
        for s_idx, s_hr in enumerate(slicer.s_hr_slices):
            counts[s_hr[0], s_hr[1], hr_t] += 1
    np.testing.assert_array_equal(counts, 1)
