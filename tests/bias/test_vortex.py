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


def test_vortex_geo_meta_and_nodata(tmp_path):
    """TIFs with .tfw world files produce a rex-style meta table and
    fill-value sites are dropped (reference writes through RexOutputs
    with a mask; bias_calc_vortex.py:144-157, 301-316)."""
    from PIL import Image

    pattern = str(tmp_path / '{month}_{height}m.tif')
    shape = (5, 4)
    for m in range(1, 13):
        name = calendar.month_name[m]
        for h in (10, 100):
            arr = (6 + h / 100 + RANDOM_GENERATOR.random(shape)
                   ).astype(np.float32)
            arr[0, 0] = np.nan  # a fill site
            fp = pattern.format(month=name, height=h)
            Image.fromarray(arr).save(fp)
            # world file: x = -105 + col*0.1, y = 40 - row*0.1
            with open(fp.replace('.tif', '.tfw'), 'w') as f:
                f.write('0.1\n0\n0\n-0.1\n-105.0\n40.0\n')
    fp_out = str(tmp_path / 'vortex_geo.h5')
    VortexMeanPrepper.run(pattern, [10, 100], [10, 50, 100], fp_out)
    with h5py.File(fp_out, 'r') as f:
        meta = f['meta'][:]
        n_sites = shape[0] * shape[1] - 1  # NaN site dropped
        assert len(meta) == n_sites
        assert f['windspeed_50m'].shape == (12, n_sites)
        assert np.isfinite(f['windspeed_50m'][:]).all()
        # world-file registration anchors the top-left pixel CENTER:
        # first surviving site is (row 0, col 1) -> (40.0, -104.9)
        np.testing.assert_allclose(meta['latitude'][0], 40.0,
                                   atol=1e-5)
        np.testing.assert_allclose(meta['longitude'][0], -104.9,
                                   atol=1e-5)
    # the output is directly loadable as a flattened baseline resource
    from sup3r_tpu.preprocessing.loaders import LoaderH5

    loader = LoaderH5(fp_out)
    assert loader.lat_lon_flat.shape == (n_sites, 2)
    block = loader.get('windspeed_50m')
    assert block.shape == (12, n_sites)
    loader.close()
