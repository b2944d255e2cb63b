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
