"""Container access grammar (reference: tests/data_wrapper/
test_access.py): single/multi feature getitem, setitem, paired-member
access, slicing, qa stats."""

import numpy as np
import pandas as pd

from sup3r_tpu.preprocessing.grid import GridDataset, PairedDataset
from sup3r_tpu.utilities.test_helpers import make_fake_dset

FEATURES = ['u_100m', 'v_100m']


def test_single_feature_access():
    d = make_fake_dset((6, 6, 8), FEATURES)
    u = d['u_100m']
    assert u.shape == (6, 6, 8)
    np.testing.assert_allclose(u, d.data[..., 0])
    # case-insensitive
    np.testing.assert_allclose(d['U_100m'], u)


def test_multi_feature_access_ordered():
    d = make_fake_dset((6, 6, 8), FEATURES)
    block = d[['v_100m', 'u_100m']]
    assert block.shape == (6, 6, 8, 2)
    np.testing.assert_allclose(block[..., 0], d['v_100m'])
    np.testing.assert_allclose(block[..., 1], d['u_100m'])


def test_as_array_feature_order():
    d = make_fake_dset((4, 4, 5), FEATURES)
    arr = d.as_array(['v_100m'])
    assert arr.shape == (4, 4, 5, 1)
    np.testing.assert_allclose(arr[..., 0], d['v_100m'])


def test_change_values():
    d = make_fake_dset((4, 4, 5), FEATURES)
    new = np.zeros((4, 4, 5), dtype=np.float32)
    d['u_100m'] = new
    np.testing.assert_allclose(d['u_100m'], 0.0)
    # adding a brand-new feature appends a channel
    d['topography'] = np.ones((4, 4, 5), dtype=np.float32)
    assert 'topography' in d.features
    assert d.data.shape[-1] == 3


def test_sample_index_crop():
    d = make_fake_dset((10, 10, 12), FEATURES)
    idx = (slice(2, 6), slice(3, 7), slice(1, 5), FEATURES)
    samp = d.sample(idx)
    assert samp.shape == (4, 4, 4, 2)
    np.testing.assert_allclose(samp, d.data[2:6, 3:7, 1:5])


def test_paired_member_access():
    lr = make_fake_dset((5, 5, 4), FEATURES)
    hr = make_fake_dset((10, 10, 4), FEATURES)
    pair = PairedDataset(low_res=lr, high_res=hr)
    assert pair['low_res'] is lr and pair['high_res'] is hr
    assert pair[0] is lr and pair[1] is hr
    assert pair.shape == hr.data.shape
    assert pair.features == FEATURES


def test_qa_stats():
    d = make_fake_dset((4, 4, 6), FEATURES)
    d.data[0, 0, 0, 0] = np.nan
    info = d.qa()
    assert info['u_100m']['nan_perc'] > 0
    assert info['v_100m']['nan_perc'] == 0
    assert 'mean' in info['u_100m'] and 'std' in info['u_100m']


def test_time_index_and_lat_lon_survive_slicing():
    d = make_fake_dset((6, 6, 8), FEATURES)
    assert isinstance(d.time_index, pd.DatetimeIndex)
    assert d.lat_lon.shape == (6, 6, 2)


def test_mixed_feature_and_dim_keys():
    """ds['u_100m', dim_keys...] selects the feature then applies dim
    slices (reference parse_keys grammar,
    sup3r/preprocessing/utilities.py:444)."""
    d = make_fake_dset((6, 6, 8), FEATURES)
    np.testing.assert_allclose(
        d['u_100m', slice(0, 2)], d.data[0:2, :, :, 0])
    np.testing.assert_allclose(
        d['u_100m', 1, 2], d.data[1, 2, :, 0])
    np.testing.assert_allclose(
        d[['u_100m', 'v_100m'], slice(0, 3), slice(1, 4)],
        d.data[0:3, 1:4, :, :])
