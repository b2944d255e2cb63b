"""Fake-data generators for tests and benchmarks (the de-facto fake
backend; mirrors reference: sup3r/utilities/pytest/helpers.py:35-137)."""

import numpy as np
import pandas as pd

from sup3r_tpu.preprocessing.grid import GridDataset, PairedDataset
from sup3r_tpu.utilities import RANDOM_GENERATOR


def make_fake_dset(shape, features, start='2023-01-01', freq='h',
                   smooth=True, lat_range=(40.0, 39.0),
                   lon_range=(-105.5, -104.3)):
    """Random-but-smooth GridDataset of the given (s1, s2, t) shape."""
    s1, s2, t = shape
    lat = np.linspace(lat_range[0], lat_range[1], s1)
    lon = np.linspace(lon_range[0], lon_range[1], s2)
    lat_lon = np.dstack(np.meshgrid(lat, lon, indexing='ij')[::1])
    lat_lon = np.dstack([lat_lon[..., 0], lat_lon[..., 1]])
    time_index = pd.date_range(start, periods=t, freq=freq)
    data = RANDOM_GENERATOR.random((s1, s2, t, len(features))).astype(
        np.float32)
    if smooth:
        # cheap spatial smoothing so derivatives/coarsening are non-trivial
        for _ in range(2):
            data = 0.5 * data + 0.25 * (
                np.roll(data, 1, axis=0) + np.roll(data, 1, axis=1))
    return GridDataset(data, features, lat_lon=lat_lon,
                       time_index=time_index)


def make_fake_nc_file(path, shape, features, start='2023-01-01',
                      freq='h', levels=None, ascending_lats=False,
                      lat_range=(40.0, 39.0), lon_range=(-105.5, -104.3)):
    """Write a NetCDF3 file (via scipy, no netCDF4 needed) with
    (time[, level], lat, lon) variables — the shape convention of raw
    ERA5/GCM files."""
    from scipy.io import netcdf_file

    s1, s2, t = shape
    lat0, lat1 = lat_range if not ascending_lats else lat_range[::-1]
    lat = np.linspace(lat0, lat1, s1)
    lon = np.linspace(*lon_range, s2)
    time_index = pd.date_range(start, periods=t, freq=freq)
    hours = ((time_index - pd.Timestamp('1900-01-01'))
             .total_seconds() / 3600).astype('float64')

    with netcdf_file(path, 'w') as f:
        f.createDimension('time', t)
        f.createDimension('lat', s1)
        f.createDimension('lon', s2)
        dims = ('time', 'lat', 'lon')
        if levels is not None:
            f.createDimension('level', len(levels))
            dims = ('time', 'level', 'lat', 'lon')
        v = f.createVariable('time', 'f8', ('time',))
        v[:] = hours
        v.units = b'hours since 1900-01-01'
        v.calendar = b'standard'
        f.createVariable('lat', 'f4', ('lat',))[:] = lat
        f.createVariable('lon', 'f4', ('lon',))[:] = lon
        if levels is not None:
            f.createVariable('level', 'f4', ('level',))[:] = np.asarray(
                levels, dtype=np.float32)
        for feat in features:
            shape_full = ((t, s1, s2) if levels is None
                          else (t, len(levels), s1, s2))
            arr = RANDOM_GENERATOR.random(shape_full).astype(np.float32)
            var = f.createVariable(feat, 'f4', dims)
            var[:] = arr
    return path


def make_fake_nc4_file(path, shape, features, start='2023-01-01',
                       freq='h', ascending_lats=False, scale_factor=None,
                       lat_range=(40.0, 39.0),
                       lon_range=(-105.5, -104.3), levels=None,
                       include_time=True, var_attrs=None,
                       calendar='standard', fill_value=None):
    """Write an HDF5-backed NetCDF4-style file via h5py (dimension
    scales attached so DIMENSION_LIST resolves) — exercises the lazy
    windowed-read loader path, which needs an h5py backend. With
    ``levels``, variables get a (time, level, lat, lon) shape.
    ``var_attrs`` maps feature -> extra dataset attrs (e.g. units);
    ``include_time=False`` writes a time-independent file (e.g. a
    static topography raster); ``fill_value`` stamps that PACKED value
    into the first element of each variable plus a ``_FillValue``
    attr."""
    s1, s2, t = shape
    lat0, lat1 = lat_range if not ascending_lats else lat_range[::-1]
    lat = np.linspace(lat0, lat1, s1).astype(np.float32)
    lon = np.linspace(*lon_range, s2).astype(np.float32)
    time_index = pd.date_range(start, periods=t, freq=freq)
    if calendar in ('noleap', '365_day', '360_day'):
        # offsets relative to `start` (the units attr says 'hours
        # since {start}' for exactly these calendars), honoring freq
        step_h = ((time_index[1] - time_index[0]).total_seconds()
                  / 3600 if t > 1 else 1.0)
        hours = np.arange(t, dtype='float64') * step_h
    else:
        hours = ((time_index - pd.Timestamp('1900-01-01'))
                 .total_seconds() / 3600).astype('float64')

    import h5py

    with h5py.File(path, 'w') as f:
        tv = None
        if include_time:
            tv = f.create_dataset('time', data=hours)
            tv.attrs['units'] = np.bytes_(
                f'hours since {start}'
                if calendar in ('noleap', '365_day', '360_day')
                else 'hours since 1900-01-01')
            tv.attrs['calendar'] = np.bytes_(calendar)
            tv.make_scale('time')
        latv = f.create_dataset('lat', data=lat)
        lonv = f.create_dataset('lon', data=lon)
        latv.make_scale('lat')
        lonv.make_scale('lon')
        lvlv = None
        if levels is not None:
            lvlv = f.create_dataset(
                'level', data=np.asarray(levels, np.float32))
            lvlv.make_scale('level')
        for feat in features:
            full_shape = (s1, s2)
            if levels is not None:
                full_shape = (len(levels), *full_shape)
            if include_time:
                full_shape = (t, *full_shape)
            arr = RANDOM_GENERATOR.random(full_shape).astype(np.float32)
            if scale_factor is not None:
                stored = np.round(arr / scale_factor).astype(np.int16)
                if fill_value is not None:
                    stored.flat[0] = fill_value
                v = f.create_dataset(feat, data=stored)
                v.attrs['scale_factor'] = np.float64(scale_factor)
                v.attrs['add_offset'] = np.float64(0.0)
            else:
                if fill_value is not None:
                    arr.flat[0] = fill_value
                v = f.create_dataset(feat, data=arr)
            if fill_value is not None:
                v.attrs['_FillValue'] = (
                    np.int16(fill_value) if scale_factor is not None
                    else np.float32(fill_value))
            for k, val in (var_attrs or {}).get(feat, {}).items():
                v.attrs[k] = val
            scales = [sc for sc in (tv, lvlv, latv, lonv)
                      if sc is not None]
            for i, sc in enumerate(scales):
                v.dims[i].attach_scale(sc)
    return path


def make_fake_flat_nc_file(path, shape, features, start='2023-01-01',
                           freq='h', lat_range=(40.0, 39.0),
                           lon_range=(-105.5, -104.3), data=None,
                           var_attrs=None, space_first=False,
                           with_topography=False):
    """Spatially-FLATTENED NetCDF4-style file via h5py: 1-D lat/lon
    over one shared 'points' dim plus (time, points) variables
    (reference flattened-NC layout: tests/loaders/
    test_file_loading.py:181). The site list is the row-major
    flattening of an (s1, s2) grid so rasterizer-reconstruction tests
    can compare directly against the gridded layout. ``data`` maps
    feature -> (t, s1, s2) values to flatten (random otherwise);
    ``space_first`` writes (points, time) variables to exercise both
    axis orders; ``with_topography`` adds a site-static topography
    variable."""
    import h5py

    s1, s2, t = shape
    lat = np.linspace(*lat_range, s1)
    lon = np.linspace(*lon_range, s2)
    lat2d, lon2d = np.meshgrid(lat, lon, indexing='ij')
    time_index = pd.date_range(start, periods=t, freq=freq)
    hours = ((time_index - pd.Timestamp('1900-01-01'))
             .total_seconds() / 3600).astype('float64')
    n = s1 * s2
    with h5py.File(path, 'w') as f:
        tv = f.create_dataset('time', data=hours)
        tv.attrs['units'] = np.bytes_('hours since 1900-01-01')
        tv.make_scale('time')
        pts = f.create_dataset('points', data=np.arange(n, dtype='f8'))
        pts.make_scale('points')
        latv = f.create_dataset(
            'latitude', data=lat2d.ravel().astype(np.float32))
        lonv = f.create_dataset(
            'longitude', data=lon2d.ravel().astype(np.float32))
        for d in (latv, lonv):
            d.dims[0].attach_scale(pts)
        for feat in features:
            arr = (np.asarray(data[feat], dtype=np.float32)
                   if data is not None and feat in data
                   else RANDOM_GENERATOR.random((t, s1, s2)).astype(
                       np.float32))
            flat = arr.reshape(t, n)
            if space_first:
                ds = f.create_dataset(feat, data=flat.T)
                ds.dims[0].attach_scale(pts)
                ds.dims[1].attach_scale(tv)
            else:
                ds = f.create_dataset(feat, data=flat)
                ds.dims[0].attach_scale(tv)
                ds.dims[1].attach_scale(pts)
            for k, v in ((var_attrs or {}).get(feat, {})).items():
                ds.attrs[k] = v
        if with_topography:
            topo = f.create_dataset(
                'topography',
                data=(RANDOM_GENERATOR.random(n) * 1000).astype(
                    np.float32))
            topo.dims[0].attach_scale(pts)
    return path


def make_fake_h5_file(path, shape, features, start='2023-01-01',
                      freq='h', scale_factor=100.0,
                      lat_range=(40.0, 39.0), lon_range=(-105.5, -104.3),
                      value_range=(0, 20)):
    """Write a rex-style flattened H5: structured 'meta', byte-string
    'time_index', scaled uint16 (time, sites) datasets."""
    import h5py

    s1, s2, t = shape
    lat = np.linspace(*lat_range, s1)
    lon = np.linspace(*lon_range, s2)
    lat2d, lon2d = np.meshgrid(lat, lon, indexing='ij')
    meta = np.zeros(s1 * s2, dtype=[('latitude', 'f4'),
                                    ('longitude', 'f4'),
                                    ('elevation', 'f4')])
    meta['latitude'] = lat2d.ravel()
    meta['longitude'] = lon2d.ravel()
    meta['elevation'] = RANDOM_GENERATOR.random(s1 * s2) * 1000
    time_index = pd.date_range(start, periods=t, freq=freq)

    with h5py.File(path, 'w') as f:
        f.create_dataset('meta', data=meta)
        f.create_dataset('time_index', data=np.array(
            [str(ts).encode() for ts in time_index]))
        for feat in features:
            lo, hi = value_range
            arr = lo + (hi - lo) * RANDOM_GENERATOR.random((t, s1 * s2))
            ds = f.create_dataset(
                feat, data=(arr * scale_factor).astype(np.uint16))
            ds.attrs['scale_factor'] = scale_factor
    return path


def make_fake_dual(shape_lr, s_enhance, t_enhance, features,
                   with_obs=False):
    """(low_res, high_res[, obs]) PairedDataset where low_res is an
    exact coarsening of high_res."""
    s1, s2, t = shape_lr
    hr = make_fake_dset((s1 * s_enhance, s2 * s_enhance, t * t_enhance),
                        features)
    from sup3r_tpu.ops import spatial_coarsening, temporal_coarsening

    lr_data = temporal_coarsening(
        spatial_coarsening(hr.data[None], s_enhance)[0][None],
        t_enhance, 'average')[0]
    lr = GridDataset(
        lr_data, features,
        lat_lon=hr.lat_lon[::s_enhance, ::s_enhance],
        time_index=hr.time_index[::t_enhance])
    if with_obs:
        obs_data = hr.data.copy()
        mask = RANDOM_GENERATOR.random(obs_data.shape) > 0.1
        obs_data[mask] = np.nan
        obs = GridDataset(obs_data, [f'{f}_obs' for f in features],
                          lat_lon=hr.lat_lon, time_index=hr.time_index)
        return PairedDataset(low_res=lr, high_res=hr, obs=obs)
    return PairedDataset(low_res=lr, high_res=hr)
