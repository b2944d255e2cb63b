"""Vortex TIF monthly means + monthly factor file updates."""

import calendar
import os

import h5py
import numpy as np
import pandas as pd

from sup3r_tpu.bias import BiasCorrectUpdate, VortexMeanPrepper
from sup3r_tpu.utilities import RANDOM_GENERATOR
from sup3r_tpu.utilities.test_helpers import make_fake_h5_file


def _make_tifs(tmp_path, heights=(10, 100), shape=(6, 6)):
    from PIL import Image

    pattern = str(tmp_path / '{month}_{height}m.tif')
    for m in range(1, 13):
        name = calendar.month_name[m]
        for h in heights:
            arr = (5 + h / 50 + RANDOM_GENERATOR.random(shape)).astype(
                np.float32)
            Image.fromarray(arr).save(
                pattern.format(month=name, height=h))
    return pattern


def test_vortex_mean_prepper(tmp_path):
    pattern = _make_tifs(tmp_path)
    fp_out = str(tmp_path / 'vortex_means.h5')
    VortexMeanPrepper.run(pattern, [10, 100], [10, 40, 100], fp_out)
    with h5py.File(fp_out, 'r') as f:
        assert f['windspeed_40m'].shape == (12, 36)
        ws10 = f['windspeed_10m'][:]
        ws40 = f['windspeed_40m'][:]
        ws100 = f['windspeed_100m'][:]
        # interpolated heights between the bracketing heights
        assert (ws10 <= ws40).mean() > 0.95
        assert (ws40 <= ws100).mean() > 0.95


def test_bias_correct_update(tmp_path):
    in_file = make_fake_h5_file(
        str(tmp_path / 'final.h5'), (4, 4, 24 * 40),
        ['windspeed_100m'], start='2023-01-01')
    bc_file = str(tmp_path / 'factors.h5')
    factors = np.ones((16, 12), dtype=np.float32)
    factors[:, 0] = 2.0  # double january
    with h5py.File(bc_file, 'w') as f:
        f.create_dataset('windspeed_100m_scalar', data=factors)
    out_file = str(tmp_path / 'corrected.h5')
    BiasCorrectUpdate.run(in_file, out_file, 'windspeed_100m', bc_file)
    with h5py.File(in_file, 'r') as fin, h5py.File(out_file,
                                                   'r') as fout:
        ti = pd.DatetimeIndex(
            [t.decode()[:26] for t in fin['time_index'][:]])
        scale = fin['windspeed_100m'].attrs['scale_factor']
        orig = fin['windspeed_100m'][:] / scale
        corr = fout['windspeed_100m'][:] / scale
        jan = ti.month == 1
        feb = ti.month == 2
        np.testing.assert_allclose(corr[jan], 2 * orig[jan], atol=0.02)
        np.testing.assert_allclose(corr[feb], orig[feb], atol=0.02)
