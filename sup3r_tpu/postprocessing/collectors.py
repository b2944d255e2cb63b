"""Collect per-chunk output files into a single final file.

Reference parity: sup3r/postprocessing/collectors/h5.py:83-833
(CollectorH5 with filename-encoded chunk ids + meta alignment),
nc.py:25-141 (CollectorNC combine-by-coords).
"""

import logging
import os
import re
from glob import glob

import h5py
import numpy as np
import pandas as pd

from sup3r_tpu.utilities import get_dset_attrs

logger = logging.getLogger(__name__)

_CHUNK_ID_PATTERN = re.compile(r'(\d{6})_(\d{6})')


def get_chunk_indices(file):
    """(temporal_idx, spatial_idx) parsed from a chunk file name
    (reference: collectors/base.py:43)."""
    m = _CHUNK_ID_PATTERN.search(os.path.basename(file))
    if not m:
        raise ValueError(f'Could not parse chunk ids from {file}')
    return int(m.group(1)), int(m.group(2))


class CollectorH5:
    """Stitch flattened-H5 chunk files into one H5 by gid + time
    alignment."""

    def __init__(self, file_paths):
        if isinstance(file_paths, str):
            file_paths = sorted(glob(file_paths))
        self.flist = sorted(file_paths, key=get_chunk_indices)
        assert self.flist, 'No chunk files to collect'

    @classmethod
    def collect(cls, file_paths, out_file, features='all',
                max_workers=None, n_writes=None, target_meta_file=None,
                join_times=False):
        """Collect chunk files into ``out_file``. ``n_writes`` bounds
        memory by splitting each feature's collection into that many
        temporal slabs (reference: collectors/h5.py:590-718)."""
        collector = cls(file_paths)
        collector._collect(out_file, features=features,
                           target_meta_file=target_meta_file,
                           n_writes=n_writes)
        return out_file

    def _read_meta(self):
        """Union meta (sorted by gid) + union time index."""
        gids, lats, lons = [], [], []
        times = []
        for fp in self.flist:
            with h5py.File(fp, 'r') as f:
                meta = f['meta'][:]
                gid = (meta['gid'] if 'gid' in meta.dtype.names
                       else np.arange(len(meta)))
                gids.append(gid)
                lats.append(meta['latitude'])
                lons.append(meta['longitude'])
                times.append(pd.DatetimeIndex(
                    [t.decode()[:26] for t in f['time_index'][:]]))
        all_gids = np.concatenate(gids)
        order = np.argsort(all_gids)
        uniq, first = np.unique(all_gids[order], return_index=True)
        lat = np.concatenate(lats)[order][first]
        lon = np.concatenate(lons)[order][first]
        all_times = pd.DatetimeIndex(
            np.unique(np.concatenate([t.values for t in times])))
        return uniq, lat, lon, all_times

    def _collect(self, out_file, features='all', target_meta_file=None,
                 n_writes=None):
        gids, lat, lon, times = self._read_meta()
        if target_meta_file is not None:
            target = pd.read_csv(target_meta_file)
            # mask to target coordinates by nearest match
            from scipy.spatial import cKDTree

            tree = cKDTree(np.column_stack([lat, lon]))
            _, idx = tree.query(
                target[['latitude', 'longitude']].values)
            keep = np.unique(idx)
            gids, lat, lon = gids[keep], lat[keep], lon[keep]

        gid_pos = {g: i for i, g in enumerate(gids)}
        time_pos = {t: i for i, t in enumerate(times)}

        with h5py.File(self.flist[0], 'r') as f:
            if features in ('all', None):
                features = [k for k in f
                            if k not in ('meta', 'time_index')]
            attrs = dict(f.attrs)

        tmp = out_file + '.tmp'
        os.makedirs(os.path.dirname(os.path.abspath(out_file)),
                    exist_ok=True)
        with h5py.File(tmp, 'w') as out:
            meta = np.zeros(len(gids), dtype=[('latitude', 'f4'),
                                              ('longitude', 'f4'),
                                              ('gid', 'i4')])
            meta['latitude'] = lat
            meta['longitude'] = lon
            meta['gid'] = gids
            out.create_dataset('meta', data=meta)
            out.create_dataset('time_index', data=np.array(
                [str(t).encode() for t in times]))
            for k, v in attrs.items():
                out.attrs[k] = v
            # memory-bounded: process chunk files in n_writes groups of
            # temporal ids (each group's rows are written then freed)
            t_ids = sorted({get_chunk_indices(fp)[0]
                            for fp in self.flist})
            n_groups = min(n_writes or 1, len(t_ids))
            t_groups = np.array_split(np.asarray(t_ids), n_groups)
            for feat in features:
                dset_attrs, dtype = get_dset_attrs(feat)
                full = out.create_dataset(
                    feat, shape=(len(times), len(gids)), dtype=dtype)
                for key, val in dset_attrs.items():
                    full.attrs[key] = val
                for group in t_groups:
                    group = set(int(g) for g in group)
                    fps = [fp for fp in self.flist
                           if get_chunk_indices(fp)[0] in group]
                    for fp in fps:
                        with h5py.File(fp, 'r') as f:
                            fmeta = f['meta'][:]
                            fgids = (fmeta['gid']
                                     if 'gid' in fmeta.dtype.names
                                     else np.arange(len(fmeta)))
                            ftimes = pd.DatetimeIndex(
                                [t.decode()[:26]
                                 for t in f['time_index'][:]])
                            rows = np.array(
                                [time_pos[t] for t in ftimes])
                            cols = np.array(
                                [gid_pos[g] for g in fgids
                                 if g in gid_pos])
                            keep_cols = np.array(
                                [i for i, g in enumerate(fgids)
                                 if g in gid_pos])
                            block = f[feat][:][:, keep_cols]
                            r0, r1 = rows.min(), rows.max() + 1
                            assert np.array_equal(
                                rows, np.arange(r0, r1)), (
                                'Non-contiguous time rows in chunk '
                                'file')
                            full[r0:r1, cols] = block
        os.replace(tmp, out_file)
        logger.info('Collected %d chunk files into %s', len(self.flist),
                    out_file)
        return out_file


class CollectorNC:
    """Combine gridded NC chunk files by coordinates."""

    @classmethod
    def collect(cls, file_paths, out_file, features='all',
                max_workers=None, res_kwargs=None):
        """Combine chunk nc files into one nc file."""
        from scipy.io import netcdf_file

        from sup3r_tpu.preprocessing.loaders import LoaderNC

        if isinstance(file_paths, str):
            file_paths = sorted(glob(file_paths))
        file_paths = sorted(file_paths, key=get_chunk_indices)
        dsets = [LoaderNC(fp).data for fp in file_paths]

        lats = np.unique(np.concatenate(
            [d.lat_lon[..., 0].ravel() for d in dsets]))[::-1]
        lons = np.unique(np.concatenate(
            [d.lat_lon[..., 1].ravel() for d in dsets]))
        times = pd.DatetimeIndex(np.unique(np.concatenate(
            [d.time_index.values for d in dsets])))
        if features in ('all', None):
            features = dsets[0].features

        lat_pos = {v: i for i, v in enumerate(lats)}
        lon_pos = {v: i for i, v in enumerate(lons)}
        time_pos = {t: i for i, t in enumerate(times)}

        full = {f: np.full((len(times), len(lats), len(lons)), np.nan,
                           dtype=np.float32) for f in features}
        for d in dsets:
            rows = [lat_pos[v] for v in d.lat_lon[:, 0, 0]]
            cols = [lon_pos[v] for v in d.lat_lon[0, :, 1]]
            t_rows = [time_pos[t] for t in d.time_index]
            for f in features:
                arr = np.transpose(d[f], (2, 0, 1))
                full[f][np.ix_(t_rows, rows, cols)] = arr

        tmp = out_file + '.tmp'
        os.makedirs(os.path.dirname(os.path.abspath(out_file)),
                    exist_ok=True)
        with netcdf_file(tmp, 'w') as f:
            f.createDimension('time', len(times))
            f.createDimension('south_north', len(lats))
            f.createDimension('west_east', len(lons))
            v = f.createVariable('time', 'f8', ('time',))
            epoch = pd.Timestamp('1970-01-01')
            v[:] = (times - epoch).total_seconds() / 3600.0
            v.units = b'hours since 1970-01-01'
            lat2d, lon2d = np.meshgrid(lats, lons, indexing='ij')
            f.createVariable('latitude', 'f4',
                             ('south_north', 'west_east'))[:] = lat2d
            f.createVariable('longitude', 'f4',
                             ('south_north', 'west_east'))[:] = lon2d
            for feat in features:
                var = f.createVariable(
                    feat, 'f4', ('time', 'south_north', 'west_east'))
                var[:] = full[feat]
        os.replace(tmp, out_file)
        logger.info('Collected %d nc chunk files into %s',
                    len(file_paths), out_file)
        return out_file
