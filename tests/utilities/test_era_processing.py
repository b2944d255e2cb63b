"""Offline ERA5 processing: standardize + combine monthly files
(reference: tests/utilities/test_era_downloader.py, minus the gated
CDS download)."""

import numpy as np
import pytest

from sup3r_tpu.preprocessing.loaders import LoaderNC
from sup3r_tpu.utilities.era_downloader import (
    EraDownloader,
    G0,
    geopotential_to_height,
    write_nc4,
)
from sup3r_tpu.utilities.test_helpers import make_fake_nc4_file


def test_geopotential_to_height():
    zg = np.array([9.80665e3, 0.0])
    np.testing.assert_allclose(geopotential_to_height(zg), [1000.0, 0])


def test_write_nc4_roundtrip(tmp_path):
    src_fp = make_fake_nc4_file(str(tmp_path / 'src.nc'), (6, 5, 8),
                                ['u100', 'v100'])
    dset = LoaderNC(src_fp).data
    out_fp = str(tmp_path / 'out.nc')
    write_nc4(out_fp, dset)
    back = LoaderNC(out_fp).data
    assert sorted(back.data_vars) == sorted(dset.data_vars)
    np.testing.assert_allclose(back.lat_lon, dset.lat_lon, rtol=1e-6)
    assert back.time_index.equals(dset.time_index)
    for name in dset.data_vars:
        np.testing.assert_allclose(back[name], dset[name], rtol=1e-6)


def test_process_file_converts_z(tmp_path):
    src_fp = make_fake_nc4_file(str(tmp_path / 'z.nc'), (5, 5, 4),
                                ['z'])
    out_fp = EraDownloader.process_file(src_fp,
                                        str(tmp_path / 'zg.nc'))
    raw = LoaderNC(src_fp).data
    proc = LoaderNC(out_fp).data
    assert 'zg' in proc.data_vars and 'z' not in proc.data_vars
    np.testing.assert_allclose(proc['zg'], raw['z'] / G0, rtol=1e-6)


def test_make_yearly_file(tmp_path):
    """Monthly files stream-concat into one time-sorted yearly file."""
    p1 = make_fake_nc4_file(str(tmp_path / 'm01.nc'), (6, 5, 10),
                            ['u100'], start='2023-01-01')
    p2 = make_fake_nc4_file(str(tmp_path / 'm02.nc'), (6, 5, 10),
                            ['u100'], start='2023-01-01 10:00')
    out_fp = EraDownloader.make_yearly_file([p1, p2],
                                            str(tmp_path / 'year.nc'))
    combined = LoaderNC(out_fp).data
    eager = LoaderNC([p1, p2]).data
    assert combined.shape[2] == 20
    assert combined.time_index.equals(eager.time_index)
    np.testing.assert_allclose(combined['u_100m'], eager['u_100m'],
                               rtol=1e-6)


def test_downloader_gated():
    dl = EraDownloader(2023, 1, [40, -106, 39, -104],
                       variables=['u100'])
    with pytest.raises(ImportError, match='cdsapi'):
        dl.download_file('u100', '/tmp/nope.nc')
