"""MultiStepGan unit semantics (mirrors reference
tests/forward_pass/test_multi_step.py): chained generate equals
manual per-model calls, per-step normalization stats, 4D<->5D
transposes, and feature-subset selection between steps."""

import numpy as np
import pytest

from sup3r_tpu.models import MultiStepGan, Sup3rGan

FEATURES = ['u_100m', 'v_100m']


def _spatial(mult=2, means=0.0, stds=1.0, out_feats=None):
    out_feats = out_feats or FEATURES
    gen = [{'class': 'Conv2D', 'filters': 8 * mult * mult,
            'kernel_size': 3, 'strides': 1, 'padding': 'same'},
           {'class': 'SpatialExpansion', 'spatial_mult': mult},
           {'class': 'Conv2D', 'filters': len(out_feats),
            'kernel_size': 3, 'strides': 1, 'padding': 'same'}]
    disc = [{'class': 'Conv2D', 'filters': 4, 'kernel_size': 3,
             'strides': 2, 'padding': 'same'},
            {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]
    model = Sup3rGan(gen, disc)
    model.meta.update(lr_features=FEATURES, hr_out_features=out_feats,
                      s_enhance=mult, t_enhance=1)
    all_feats = sorted(set(FEATURES) | set(out_feats))
    model.set_norm_stats({f: means for f in all_feats},
                         {f: stds for f in all_feats})
    model.init_weights((1, 4, 4, len(FEATURES)),
                       (1, 4 * mult, 4 * mult, len(out_feats)))
    return model


def _temporal(t_mult=2):
    gen = [{'class': 'Conv3D', 'filters': 8, 'kernel_size': 3,
            'strides': 1, 'padding': 'same'},
           {'class': 'SpatioTemporalExpansion', 'temporal_mult': t_mult,
            'temporal_method': 'nearest'},
           {'class': 'Conv3D', 'filters': 2, 'kernel_size': 3,
            'strides': 1, 'padding': 'same'}]
    disc = [{'class': 'Conv3D', 'filters': 4, 'kernel_size': 3,
             'strides': 2, 'padding': 'same'},
            {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]
    model = Sup3rGan(gen, disc)
    model.meta.update(lr_features=FEATURES, hr_out_features=FEATURES,
                      s_enhance=1, t_enhance=t_mult)
    model.set_norm_stats({f: 0.3 for f in FEATURES},
                         {f: 2.0 for f in FEATURES})
    model.init_weights((1, 8, 8, 2, 2), (1, 8, 8, 4, 2))
    return model


def test_chain_equals_manual_calls():
    """MultiStepGan.generate == manually chaining model.generate with
    the per-step norm flags (each step denormalizes then the next
    renormalizes with ITS stats)."""
    m1 = _spatial(2, means=0.1, stds=1.5)
    m2 = _spatial(2, means=0.4, stds=0.7)
    ms = MultiStepGan([m1, m2])
    lr = np.random.default_rng(0).random((1, 4, 4, 2)).astype(
        np.float32)
    chained = ms.generate(lr)
    manual = m2.generate(m1.generate(lr))
    np.testing.assert_allclose(chained, manual, rtol=1e-5, atol=1e-6)
    assert chained.shape == (1, 16, 16, 2)


def test_4d_to_5d_transpose():
    """A 4D spatial step feeding a 5D temporal step transposes
    (t, s1, s2, f) -> (1, s1, s2, t, f) exactly (reference:
    multi_step.py:128)."""
    m1 = _spatial(2)
    m2 = _temporal(2)
    ms = MultiStepGan([m1, m2])
    assert ms.is_4d
    # 4D input: time as the observation axis
    lr = np.random.default_rng(1).random((2, 4, 4, 2)).astype(
        np.float32)
    out = ms.generate(lr)
    # manual: spatial on each time step, then transpose into 5D
    mid = m1.generate(lr)
    mid5 = np.transpose(mid, (1, 2, 0, 3))[None]
    manual = m2.generate(mid5)
    np.testing.assert_allclose(out, manual, rtol=1e-5, atol=1e-6)
    assert out.shape == (1, 8, 8, 4, 2)


def test_feature_subset_between_steps():
    """When step N outputs more features than step N+1 consumes, the
    needed channels are selected by name (reference:
    multi_step.py:172)."""
    m1 = _spatial(2, out_feats=['u_100m', 'v_100m', 'topography'])
    m2 = _spatial(2)
    ms = MultiStepGan([m1, m2])
    lr = np.random.default_rng(2).random((1, 4, 4, 2)).astype(
        np.float32)
    out = ms.generate(lr)
    mid = m1.generate(lr)
    manual = m2.generate(mid[..., :2])
    np.testing.assert_allclose(out, manual, rtol=1e-5, atol=1e-6)


def test_missing_feature_between_steps_raises():
    m1 = _spatial(2, out_feats=['u_100m'])  # drops v
    m2 = _spatial(2)
    ms = MultiStepGan([m1, m2])
    lr = np.random.default_rng(3).random((1, 4, 4, 2)).astype(
        np.float32)
    with pytest.raises(ValueError, match='not all in'):
        ms.generate(lr)


def test_enhancement_aggregation():
    ms = MultiStepGan([_spatial(2), _spatial(3), _temporal(4)])
    assert ms.s_enhancements == [2, 3, 1]
    assert ms.t_enhancements == [1, 1, 4]
    assert ms.s_enhance == 6 and ms.t_enhance == 4
