"""Sampler feature-set routing (mirrors reference
tests/samplers/test_feature_sets.py) + grid container + stats."""

import numpy as np
import pytest

from sup3r_tpu.preprocessing import GridDataset, Sampler
from sup3r_tpu.preprocessing.stats import StatsCollection
from sup3r_tpu.utilities.test_helpers import make_fake_dset


def test_feature_sets_split():
    features = ['u_100m', 'v_100m', 'clearsky_ratio', 'topography',
                'sza']
    data = make_fake_dset((12, 12, 10), features)
    sampler = Sampler(
        data, sample_shape=(4, 4, 2),
        feature_sets={'features': features,
                      'lr_only_features': ['clearsky_ratio'],
                      'hr_exo_features': ['topography', 'sza']})
    assert sampler.lr_features == features
    assert sampler.hr_features == ['u_100m', 'v_100m', 'topography',
                                   'sza']
    assert sampler.hr_out_features == ['u_100m', 'v_100m']
    assert sampler.hr_exo_features == ['topography', 'sza']
    assert sampler.hr_features_ind == [0, 1, 3, 4]
    sample = next(sampler)
    assert sample.shape == (4, 4, 2, 5)


def test_exo_features_must_be_last():
    features = ['topography', 'u_100m']
    data = make_fake_dset((8, 8, 4), features)
    with pytest.raises(ValueError, match='LAST'):
        Sampler(data, sample_shape=(4, 4, 1),
                feature_sets={'hr_exo_features': ['topography']})


def test_wildcard_exo_features():
    features = ['u_100m', 'topography']
    data = make_fake_dset((8, 8, 4), features)
    sampler = Sampler(data, sample_shape=(4, 4, 1),
                      feature_sets={'hr_exo_features': ['topo*']})
    assert sampler.hr_exo_features == ['topography']


def test_grid_dataset_container_api():
    data = make_fake_dset((8, 8, 6), ['u_100m', 'v_100m'])
    # getitem variants
    assert data['u_100m'].shape == (8, 8, 6)
    assert data[['u_100m', 'v_100m']].shape == (8, 8, 6, 2)
    # setitem adds a channel
    data['new_feat'] = np.zeros((8, 8, 6), np.float32)
    assert 'new_feat' in data.features
    # slicing
    sub = data.slice_dset(slice(0, 4), slice(0, 4), slice(0, 3),
                          features=['u_100m'])
    assert sub.shape == (4, 4, 3, 1)
    assert sub.lat_lon.shape == (4, 4, 2)
    # qa report
    report = data.qa()
    assert report['u_100m']['nan_perc'] == 0
    # sample
    s = data.sample((slice(0, 2), slice(0, 2), slice(0, 2),
                     ['v_100m']))
    assert s.shape == (2, 2, 2, 1)


def test_stats_collection_weighted(tmp_path):
    d1 = make_fake_dset((4, 4, 10), ['u_100m'])
    d2 = make_fake_dset((4, 4, 30), ['u_100m'])
    d2.data += 2.0
    m1, m2 = d1.data.mean(), d2.data.mean()
    v1, v2 = d1.data.var(), d2.data.var()
    means_fp = str(tmp_path / 'means.json')
    stds_fp = str(tmp_path / 'stds.json')
    stats = StatsCollection([d1, d2], means=means_fp, stds=stds_fp)
    # size weights 0.25/0.75
    np.testing.assert_allclose(stats.means['u_100m'],
                               0.25 * m1 + 0.75 * m2, rtol=1e-5)
    np.testing.assert_allclose(stats.stds['u_100m'],
                               np.sqrt(0.25 * v1 + 0.75 * v2),
                               rtol=1e-5)
    # containers normalized in place
    np.testing.assert_allclose(
        d1.data.mean() * stats.stds['u_100m'] + stats.means['u_100m'],
        m1, rtol=1e-4)
    # stats persisted and reloadable
    d3 = make_fake_dset((4, 4, 10), ['u_100m'])
    stats2 = StatsCollection([d3], means=means_fp, stds=stds_fp)
    assert stats2.means == stats.means


@pytest.mark.parametrize(
    ('features', 'lr_only_features', 'hr_exo_features'),
    [
        # nothing left for hr output
        (['u_100m'], ['u_100m'], []),
        (['u_100m'], [], ['u_100m']),
        # exo features must come LAST in the feature order
        (['u_100m', 'v_100m'], [], ['u_100m']),
        (['u_100m', 'v_100m'], [], ['v_100m', 'u_100m']),
    ],
)
def test_feature_set_errors(features, lr_only_features,
                            hr_exo_features):
    """Invalid splits raise loudly (reference:
    tests/samplers/test_feature_sets.py:14-36 test_feature_errors)."""
    data = make_fake_dset((12, 12, 10), features)
    with pytest.raises((RuntimeError, AssertionError, ValueError)):
        sampler = Sampler(
            data, sample_shape=(4, 4, 2),
            feature_sets={'features': features,
                          'lr_only_features': lr_only_features,
                          'hr_exo_features': hr_exo_features})
        _ = sampler.lr_features
        _ = sampler.hr_out_features
        assert sampler.hr_out_features, 'no hr output features left'


@pytest.mark.parametrize(
    ('features', 'lr_only', 'hr_exo'),
    [
        (['u_100m', 'v_100m', 'topography'], ['v_100m'],
         ['topography']),
        (['u_100m', 'v_100m', 'topography'], [], ('topography',)),
        (['u_100m', 'v_100m'], ['v_100m'], []),
    ],
)
def test_feature_set_valid_combos(features, lr_only, hr_exo):
    """Mixed lr/hr splits that must work (reference:
    test_mixed_lr_hr_features)."""
    data = make_fake_dset((12, 12, 10), features)
    sampler = Sampler(
        data, sample_shape=(4, 4, 2),
        feature_sets={'features': features,
                      'lr_only_features': list(lr_only),
                      'hr_exo_features': list(hr_exo)})
    assert sampler.lr_features == features
    expected_out = [f for f in features
                    if f not in lr_only and f not in hr_exo]
    assert sampler.hr_out_features == expected_out
    sample = next(sampler)
    assert sample.shape == (4, 4, 2, len(features))
