"""Offline ERA5 processing: standardize + combine monthly files
(reference: tests/utilities/test_era_downloader.py, minus the gated
CDS download)."""

import os

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
                       variables=['100m_u_component_of_wind'])
    with pytest.raises(ImportError, match='cdsapi'):
        dl.download_file('100m_u_component_of_wind', '/tmp/nope.nc')


# ---------------------------------------------------------------------------
# CDS request construction + orchestration with an injected fake client
# (reference: era_downloader.py:44-937, tested without egress)

#: long CDS name -> short name as CDS delivers it in netcdf files
_SHORT = {'100m_u_component_of_wind': 'u100',
          '100m_v_component_of_wind': 'v100',
          '10m_u_component_of_wind': 'u10',
          'geopotential': 'z',
          'u_component_of_wind': 'u',
          '2m_temperature': 't2m'}


class FakeClient:
    """Injectable CDS stand-in: records every request and writes a
    fake NetCDF4 file honoring the request's variables/area/times."""

    def __init__(self, fail_first=0):
        self.requests = []
        self._fails_left = fail_first

    def retrieve(self, dataset, entry, out_file):
        self.requests.append((dataset, entry, out_file))
        if self._fails_left > 0:
            self._fails_left -= 1
            # simulate a partial download: garbage bytes on disk
            with open(out_file, 'wb') as f:
                f.write(b'CORRUPT')
            return
        n_t = (len(entry.get('day', ['01'])) * len(entry['time'])
               if 'day' in entry else len(entry['time']))
        area = entry['area']
        feats = [_SHORT[v] for v in entry['variable']]
        levels = entry.get('pressure_level')
        make_fake_nc4_file(
            out_file, (4, 5, n_t), feats,
            start=f"{entry['year']}-{entry['month']}-01",
            lat_range=(area[0], area[2]),
            lon_range=(area[1], area[3]),
            levels=[float(lv) for lv in levels] if levels else None)


def test_build_cds_request_surface():
    from sup3r_tpu.utilities.era_downloader import build_cds_request

    dataset, entry = build_cds_request(
        ['100m_u_component_of_wind'], 2023, 2, [40, -106, 39, -104],
        days=[1, 2, 3], product_type='reanalysis')
    assert dataset == 'reanalysis-era5-single-levels'
    assert entry['product_type'] == ['reanalysis']
    assert entry['year'] == '2023' and entry['month'] == '02'
    assert entry['day'] == ['01', '02', '03']
    assert len(entry['time']) == 24
    assert 'pressure_level' not in entry


def test_build_cds_request_pressure_monthly():
    from sup3r_tpu.utilities.era_downloader import build_cds_request

    dataset, entry = build_cds_request(
        ['u_component_of_wind'], 2023, 2, [40, -106, 39, -104],
        levels=[900, 1000], level_type='pressure',
        product_type='monthly_averaged_reanalysis')
    assert dataset == 'reanalysis-era5-pressure-levels-monthly-means'
    assert entry['pressure_level'] == ['900', '1000']
    assert entry['time'] == ['00:00']
    assert 'day' not in entry  # monthly means have no day key


def test_build_cds_request_default_days():
    """Days default to the full calendar month (incl. leap Feb)."""
    from sup3r_tpu.utilities.era_downloader import build_cds_request

    _, entry = build_cds_request(['2m_temperature'], 2024, 2,
                                 [40, -106, 39, -104])
    assert len(entry['day']) == 29


def test_variable_expansion_and_split():
    """'u' expands to all wind components; orog/zg pull geopotential
    into the right request list (reference: era_downloader.py:177-225)."""
    dl = EraDownloader(2023, 1, [40, -106, 39, -104],
                       variables=['u', 'orog', 'zg'],
                       levels=[1000])
    assert '10m_u_component_of_wind' in dl.sfc_file_variables
    assert '100m_u_component_of_wind' in dl.sfc_file_variables
    assert 'u_component_of_wind' in dl.level_file_variables
    assert 'geopotential' in dl.sfc_file_variables  # orog
    assert 'geopotential' in dl.level_file_variables  # zg


def test_unknown_variable_warns():
    with pytest.warns(UserWarning, match='not available'):
        EraDownloader(2023, 1, [40, -106, 39, -104],
                      variables=['not_a_var'])


def test_monthly_download_process_combine(tmp_path):
    """Full single-month routine with a fake client: sfc + level
    downloads -> z converted to orog/zg -> merged monthly file with
    canonical names."""
    client = FakeClient()
    pattern = str(tmp_path / 'era5_{year}_{month}_{var}.nc')
    dl = EraDownloader(
        2023, 1, [40, -106, 39, -104], days=[1, 2],
        levels=[900, 1000], variables=['u_100m', 'zg', 'orog'],
        monthly_file_pattern=pattern, client=client)
    fp = dl.get_monthly_file()
    assert len(client.requests) == 2  # one sfc + one pressure request
    datasets = sorted(r[0] for r in client.requests)
    assert datasets == ['reanalysis-era5-pressure-levels',
                        'reanalysis-era5-single-levels']
    dset = LoaderNC(fp).data
    assert 'u_100m' in dset.data_vars
    assert 'zg' in dset.data_vars and 'z' not in dset.data_vars
    # the loader canonicalizes orog -> topography on read
    assert 'topography' in dset.data_vars
    # intermediates are cleaned up
    assert not os.path.exists(dl.surface_file)
    assert not os.path.exists(dl.level_file)
    # second run skips: no new requests
    dl.get_monthly_file()
    assert len(client.requests) == 2


def test_corrupt_download_retried(tmp_path):
    """A garbage partial download is detected and re-requested."""
    client = FakeClient()
    pattern = str(tmp_path / 'era5_{year}_{month}_{var}.nc')
    dl = EraDownloader(2023, 1, [40, -106, 39, -104], days=[1],
                       variables=['u_100m'],
                       monthly_file_pattern=pattern, client=client)
    with open(dl.surface_file, 'wb') as f:
        f.write(b'CORRUPT')
    dl.get_monthly_file()
    assert len(client.requests) == 1  # corrupt file was not "skipped"
    assert 'u_100m' in LoaderNC(dl.monthly_file).data.data_vars


def test_run_for_var_yearly_combine(tmp_path):
    """12 monthly downloads combine into one yearly variable file."""
    client = FakeClient()
    monthly = str(tmp_path / 'era5_{year}_{month}_{var}.nc')
    yearly = str(tmp_path / 'era5_{year}_{var}.nc')
    out = EraDownloader.run_for_var(
        2023, [40, -106, 39, -104], monthly_file_pattern=monthly,
        yearly_file_pattern=yearly, days=[[1]] * 12,
        variable='u_100m', max_workers=2, client=client)
    assert len(client.requests) == 12
    dset = LoaderNC(out).data
    assert dset.shape[2] == 12 * 24  # 12 months x 1 day x 24 hours
    ti = dset.time_index
    assert ti.is_monotonic_increasing
    assert sorted(set(ti.month)) == list(range(1, 13))
    # rerun skips everything
    EraDownloader.run_for_var(
        2023, [40, -106, 39, -104], monthly_file_pattern=monthly,
        yearly_file_pattern=yearly, days=[[1]] * 12,
        variable='u_100m', client=client)
    assert len(client.requests) == 12


def test_run_combines_all_vars(tmp_path):
    """Top-level run(): per-var yearly files then one combined file."""
    client = FakeClient()
    monthly = str(tmp_path / 'era5_{year}_{month}_{var}.nc')
    yearly = str(tmp_path / 'era5_{year}_{var}.nc')
    out = EraDownloader.run(
        2023, [40, -106, 39, -104], monthly_file_pattern=monthly,
        yearly_file_pattern=yearly, days=[[1]] * 12,
        variables=['u_100m', 'v_100m'], combine_all_files=True,
        client=client)
    assert out is not None and os.path.exists(out)
    dset = LoaderNC(out).data
    assert {'u_100m', 'v_100m'} <= set(dset.data_vars)


def test_run_qa(tmp_path):
    fp = make_fake_nc4_file(str(tmp_path / 'qa.nc'), (4, 5, 6),
                            ['u100'])
    info = EraDownloader.run_qa(fp)
    assert info['features'] == ['u_100m']
    assert info['shape'][2] == 6


def test_default_hours_by_product_type():
    """Hour lists per CDS product type (reference:
    era_downloader.py:129-144): hourly reanalysis = 24 steps,
    monthly means = one step, ensemble products = 3-hourly."""
    from sup3r_tpu.utilities.era_downloader import default_hours

    assert default_hours('reanalysis') == [
        f'{h:02d}:00' for h in range(24)]
    assert default_hours('monthly_averaged_reanalysis') == ['00:00']
    assert default_hours('monthly_averaged_ensemble_members') == [
        '00:00']
    assert default_hours('monthly_averaged_reanalysis_by_hour_of_day'
                         ) == [f'{h:02d}:00' for h in range(24)]
    assert default_hours('ensemble_mean') == [
        f'{h:02d}:00' for h in range(0, 24, 3)]
