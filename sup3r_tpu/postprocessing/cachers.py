"""Feature cache: write derived GridDatasets to per-feature H5 files
with atomic tmp+rename, reload on cache hit.

Reference parity: sup3r/writers/cachers.py:35-592 (Cacher),
sup3r/writers/utilities.py:9 (_check_for_cache).
"""

import logging
import os
from glob import glob

import h5py
import numpy as np
import pandas as pd

from sup3r_tpu.preprocessing.grid import GridDataset

logger = logging.getLogger(__name__)


class Cacher:
    """Write each feature of a GridDataset to its own H5 file."""

    def __init__(self, data, cache_kwargs):
        """cache_kwargs must include 'cache_pattern' with a '{feature}'
        placeholder; optional 'chunks' and 'max_workers'."""
        self.out_files = self.cache_data(
            data, cache_kwargs['cache_pattern'],
            chunks=cache_kwargs.get('chunks'))

    @staticmethod
    def cache_data(data, cache_pattern, chunks=None):
        """Write all features; returns the file list."""
        assert '{feature}' in cache_pattern, (
            'cache_pattern must contain "{feature}"')
        os.makedirs(os.path.dirname(os.path.abspath(cache_pattern)),
                    exist_ok=True)
        out_files = []
        for i, feature in enumerate(data.features):
            fp = cache_pattern.format(feature=feature)
            if os.path.exists(fp):
                out_files.append(fp)
                continue
            tmp = fp + '.tmp'
            from sup3r_tpu.utilities import OUTPUT_ATTRS
            from sup3r_tpu.names import get_feature_basename

            attrs = OUTPUT_ATTRS.get(get_feature_basename(feature), {})
            with h5py.File(tmp, 'w') as f:
                chunk_spec = None
                if chunks:
                    chunk_spec = tuple(chunks.get(feature, chunks)
                                       ) if isinstance(
                        chunks, dict) else tuple(chunks)
                ds = f.create_dataset(feature, data=data.data[..., i],
                                      chunks=chunk_spec)
                if 'scale_factor' in attrs:
                    ds.attrs['units'] = attrs.get('units', '')
                f.create_dataset('latitude', data=data.lat_lon[..., 0])
                f.create_dataset('longitude', data=data.lat_lon[..., 1])
                if data.time_index is not None:
                    f.create_dataset(
                        'time_index',
                        data=data.time_index.values.astype('int64'))
            os.replace(tmp, fp)
            out_files.append(fp)
            logger.debug('Cached %s to %s', feature, fp)
        return out_files


def load_cached(cache_pattern, features):
    """Reload a GridDataset from cache files if ALL requested features
    are present; returns None on any miss."""
    if features in ('all', None):
        fps = sorted(glob(cache_pattern.format(feature='*')))
        if not fps:
            return None
        features = []
        for fp in fps:
            with h5py.File(fp, 'r') as f:
                features.extend(
                    k for k in f
                    if k not in ('latitude', 'longitude', 'time_index'))
    features = [f.lower() for f in features]
    fps = [cache_pattern.format(feature=f) for f in features]
    if not all(os.path.exists(fp) for fp in fps):
        return None
    arrs, lat_lon, ti = [], None, None
    for f, fp in zip(features, fps):
        with h5py.File(fp, 'r') as h:
            arrs.append(h[f][:])
            if lat_lon is None:
                lat_lon = np.dstack([h['latitude'][:],
                                     h['longitude'][:]])
                if 'time_index' in h:
                    ti = pd.DatetimeIndex(
                        h['time_index'][:].astype('datetime64[ns]'))
    logger.info('Loaded cached features %s', features)
    return GridDataset(np.stack(arrs, axis=-1), features,
                       lat_lon=lat_lon, time_index=ti)
