"""ERA5 download + preprocessing via the CDS API.

Reference parity: sup3r/utilities/era_downloader.py:44-937. The CDS
API requires network access + credentials; this module gates on the
``cdsapi`` package and otherwise provides the variable tables and the
geopotential->height conversion used downstream.
"""

import logging
import os

import numpy as np

from sup3r_tpu.names import LEVEL_VARS, SFC_VARS

logger = logging.getLogger(__name__)

#: standard gravity used for geopotential -> height (m)
G0 = 9.80665


def geopotential_to_height(zg):
    """Convert geopotential (m2/s2) to geopotential height (m)."""
    return np.asarray(zg) / G0


class EraDownloader:
    """Download and standardize monthly ERA5 variable files."""

    SFC_VARS = SFC_VARS
    LEVEL_VARS = LEVEL_VARS

    def __init__(self, year, month, area, levels=None, variables=None,
                 combined_out_pattern='./era5_{year}_{month}_{var}.nc',
                 product_type='reanalysis'):
        self.year = year
        self.month = month
        self.area = area
        self.levels = levels or []
        self.variables = variables or []
        self.combined_out_pattern = combined_out_pattern
        self.product_type = product_type

    def _get_client(self):
        try:
            import cdsapi
        except ImportError as e:
            raise ImportError(
                'The ERA5 downloader requires the "cdsapi" package and '
                'CDS credentials (~/.cdsapirc). Install cdsapi and '
                'configure credentials to use this module.') from e
        return cdsapi.Client()

    def download_file(self, variable, out_fp):
        """Request one variable-month file from CDS."""
        client = self._get_client()
        dataset = ('reanalysis-era5-single-levels'
                   if variable in self.SFC_VARS
                   else 'reanalysis-era5-pressure-levels')
        request = {
            'product_type': self.product_type,
            'format': 'netcdf',
            'variable': variable,
            'year': str(self.year),
            'month': f'{self.month:02d}',
            'day': [f'{d:02d}' for d in range(1, 32)],
            'time': [f'{h:02d}:00' for h in range(24)],
            'area': self.area,
        }
        if variable in self.LEVEL_VARS and self.levels:
            request['pressure_level'] = [str(p) for p in self.levels]
        logger.info('Requesting %s from CDS -> %s', variable, out_fp)
        client.retrieve(dataset, request, out_fp)
        return out_fp

    def run(self):
        """Download all requested variables for the month."""
        out = []
        for var in self.variables:
            fp = self.combined_out_pattern.format(
                year=self.year, month=f'{self.month:02d}', var=var)
            if os.path.exists(fp):
                logger.info('%s exists, skipping', fp)
            else:
                self.download_file(var, fp)
            out.append(fp)
        return out

    # ------------------------------------------------------------------
    # offline processing (no network needed; reference parity:
    # era_downloader.py process_and_combine / make_yearly_file)
    @staticmethod
    def process_file(in_fp, out_fp):
        """Standardize one raw ERA5 file: canonical names/dims via the
        loader (descending lats/levels, short-name mapping) and
        geopotential ``z`` converted to height ``zg`` in meters."""
        from sup3r_tpu.preprocessing.loaders import LoaderNC

        dset = LoaderNC(in_fp).data
        if 'z' in dset.data_vars:
            dset.data_vars['zg'] = geopotential_to_height(
                dset.data_vars.pop('z'))
            dset.var_dims['zg'] = dset.var_dims.pop('z')
        write_nc4(out_fp, dset)
        return out_fp

    @staticmethod
    def make_yearly_file(monthly_pattern, out_fp):
        """Combine monthly files (glob pattern or list) into one
        yearly file, time-sorted, using lazy per-window reads so a
        year of hourly data never fully materializes twice."""
        from sup3r_tpu.preprocessing.loaders import LoaderNC

        loader = LoaderNC(monthly_pattern, lazy=True)
        write_nc4(out_fp, loader.data)
        loader.close()
        return out_fp


def write_nc4(out_fp, dset):
    """Write a RawDataset to an HDF5-backed NetCDF4-style file (h5py
    dimension scales, so it round-trips through LoaderNC and any
    netCDF4 reader)."""
    import h5py

    from sup3r_tpu.names import Dimension

    os.makedirs(os.path.dirname(os.path.abspath(out_fp)), exist_ok=True)
    tmp = out_fp + '.tmp'
    with h5py.File(tmp, 'w') as f:
        scales = {}
        lat = dset.lat_lon[:, 0, 0]
        lon = dset.lat_lon[0, :, 1]
        scales[Dimension.SOUTH_NORTH] = f.create_dataset(
            'latitude', data=lat.astype(np.float32))
        scales[Dimension.WEST_EAST] = f.create_dataset(
            'longitude', data=lon.astype(np.float32))
        if dset.time_index is not None:
            hours = ((dset.time_index
                      - dset.time_index[0]).total_seconds()
                     / 3600).astype('float64')
            tv = f.create_dataset('time', data=np.asarray(hours))
            start = dset.time_index[0].strftime('%Y-%m-%d %H:%M:%S')
            tv.attrs['units'] = np.bytes_(f'hours since {start}')
            tv.attrs['calendar'] = np.bytes_('standard')
            scales[Dimension.TIME] = tv
        if dset.levels is not None:
            lv = f.create_dataset(
                'level', data=np.asarray(dset.levels, np.float32))
            scales[Dimension.PRESSURE_LEVEL] = lv
        for name, ds in scales.items():
            ds.make_scale(ds.name.strip('/'))
        for name, arr in dset.data_vars.items():
            dims = dset.var_dims[name]
            if hasattr(arr, 'isel') and Dimension.TIME in dims:
                # lazy: stream time slabs instead of materializing
                v = f.create_dataset(name, shape=arr.shape,
                                     dtype=np.float32)
                t_ax = dims.index(Dimension.TIME)
                nt = arr.shape[t_ax]
                step = max(1, int(2e8 // max(
                    np.prod(arr.shape) // max(nt, 1), 1)))
                for t0 in range(0, nt, step):
                    sel = {Dimension.TIME: slice(t0, min(t0 + step,
                                                         nt))}
                    idx = tuple(sel.get(d, slice(None)) for d in dims)
                    v[idx] = arr.isel(sel)
            else:
                v = f.create_dataset(
                    name, data=np.asarray(arr, dtype=np.float32))
            for i, d in enumerate(dims):
                if d in scales:
                    v.dims[i].attach_scale(scales[d])
    os.replace(tmp, out_fp)
    return out_fp
