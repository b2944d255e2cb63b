"""Data-plane regressions from the round-5 preprocessing review:
multi-file H5 ordering/completeness guards, lazy time_roll=1
rejection, paired-dataset stats member, zero-complete-day daily
handling, and rasterizer edge-clip warnings."""

import h5py
import numpy as np
import pytest

from sup3r_tpu.preprocessing import DataHandler
from sup3r_tpu.preprocessing.grid import GridDataset, PairedDataset
from sup3r_tpu.preprocessing.loaders import LoaderH5
from sup3r_tpu.preprocessing.rasterizers import Rasterizer
from sup3r_tpu.utilities.test_helpers import make_fake_h5_file


def test_loader_h5_reorders_members_chronologically(tmp_path):
    """Member files listed (or lexically sorted) out of chronological
    order must be reordered, like LoaderNCFlat — concatenating in
    filename order silently misaligns every sample."""
    late = make_fake_h5_file(str(tmp_path / 'a_feb.h5'), (3, 4, 8),
                             ['windspeed_100m'], start='2023-02-01')
    early = make_fake_h5_file(str(tmp_path / 'b_jan.h5'), (3, 4, 8),
                              ['windspeed_100m'], start='2023-01-01')
    ldr = LoaderH5([late, early])  # wrong (lexical-style) order
    ti = ldr.time_index
    assert ti.is_monotonic_increasing
    assert ti[0].month == 1 and ti[-1].month == 2
    # the data follows the reorder: first block reads from the Jan file
    with h5py.File(early) as f:
        jan0 = f['windspeed_100m'][0, :] / 100.0
    got = ldr.get('windspeed_100m', time_slice=slice(0, 1))[0]
    np.testing.assert_allclose(got, jan0, atol=1e-6)
    ldr.close()


def test_loader_h5_overlapping_times_raise(tmp_path):
    a = make_fake_h5_file(str(tmp_path / 'a.h5'), (3, 4, 8),
                          ['windspeed_100m'], start='2023-01-01')
    b = make_fake_h5_file(str(tmp_path / 'b.h5'), (3, 4, 8),
                          ['windspeed_100m'], start='2023-01-01T04:00')
    with pytest.raises(ValueError, match='overlapping'):
        LoaderH5([a, b])


def test_loader_h5_missing_dataset_raises(tmp_path):
    """A time-varying dataset absent from one member would be silently
    short along the concatenated time axis."""
    a = make_fake_h5_file(str(tmp_path / 'a.h5'), (3, 4, 8),
                          ['windspeed_100m', 'pressure_100m'],
                          start='2023-01-01')
    b = make_fake_h5_file(str(tmp_path / 'b.h5'), (3, 4, 8),
                          ['windspeed_100m', 'pressure_100m'],
                          start='2023-01-02')
    with h5py.File(b, 'a') as f:
        del f['pressure_100m']
    with pytest.raises(ValueError, match='missing'):
        LoaderH5([a, b])


def test_loader_h5_mixed_time_index_raises(tmp_path):
    a = make_fake_h5_file(str(tmp_path / 'a.h5'), (3, 4, 8),
                          ['windspeed_100m'], start='2023-01-01')
    b = make_fake_h5_file(str(tmp_path / 'b.h5'), (3, 4, 8),
                          ['windspeed_100m'], start='2023-01-02')
    with h5py.File(b, 'a') as f:
        del f['time_index']
    with pytest.raises(ValueError, match='time_index'):
        LoaderH5([a, b])


def test_lazy_time_roll_one_rejected(tmp_path):
    """time_roll=1 is a REAL one-step roll, not an identity — the lazy
    plane must reject it like any other roll instead of silently
    dropping it (data misaligned by one step vs eager)."""
    fp = make_fake_h5_file(str(tmp_path / 'x.h5'), (4, 4, 48),
                           ['windspeed_100m'])
    with pytest.raises(NotImplementedError, match='time_roll'):
        DataHandler(fp, features=['windspeed_100m'], mode='lazy',
                    time_roll=1)
    # identity values stay accepted
    DataHandler(fp, features=['windspeed_100m'], mode='lazy',
                time_roll=0, hr_spatial_coarsen=1)


def test_paired_dataset_stats_use_high_res_member():
    """Reference Sup3rDataset computes stats from member index 1
    (base.py:288-298): the high-res/hourly member, not the
    low-res/daily one."""
    lo = GridDataset(np.full((4, 4, 6, 1), 2.0, np.float32), ['f'])
    hi = GridDataset(np.full((8, 8, 6, 1), 10.0, np.float32), ['f'])
    pair = PairedDataset(low_res=lo, high_res=hi)
    assert float(pair.mean()['f']) == 10.0
    assert float(pair.std()['f']) == 0.0


def test_daily_handler_zero_complete_days_is_loud(tmp_path):
    """24 hourly steps from 12:00 to 11:00 pass the length check but
    contain zero COMPLETE calendar days — the prepared message must
    fire, not an opaque np.stack([]) error."""
    from sup3r_tpu.preprocessing.data_handlers import (
        DataHandlerH5WindCC,
    )

    fp = make_fake_h5_file(str(tmp_path / 'x.h5'), (4, 4, 24),
                           ['windspeed_100m'],
                           start='2023-01-01T12:00')
    with pytest.raises(AssertionError, match='full day'):
        DataHandlerH5WindCC(fp, features=['windspeed_100m'])


def test_rasterizer_warns_on_clipped_shape(tmp_path):
    """A requested shape that runs off the domain edge is clipped WITH
    a warning (reference rasterizers/base.py:166-191) instead of
    silently returning a smaller grid."""
    fp = make_fake_h5_file(str(tmp_path / 'x.h5'), (5, 4, 6),
                           ['windspeed_100m'])
    # target at the NORTHERNMOST row: no rows above it to fill shape
    with pytest.warns(UserWarning, match='clipping'):
        r = Rasterizer(fp, target=(40.0, -105.5), shape=(4, 4))
    assert r.lat_lon.shape[:2] == (1, 4)
