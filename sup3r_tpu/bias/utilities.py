"""Runtime bias-correction dispatch for the forward-pass chunk path.

Reference parity: sup3r/bias/utilities.py:221-332 (bias_correct_feature
/ bias_correct_features invoked from ForwardPassStrategy.prep_chunk_data).
"""

import inspect
import logging

import numpy as np

import sup3r_tpu.bias.transforms as transforms_mod
from sup3r_tpu.bias.transforms import get_date_range_kwargs

logger = logging.getLogger(__name__)


def bias_correct_feature(source_feature, data, feature_names, lat_lon,
                         time_index, bc_method, bc_kwargs,
                         lr_padded_slice=None):
    """Bias correct one feature channel in a chunk array.

    data: (s1, s2, t, n_features) padded chunk input.
    lr_padded_slice: the chunk's padded (row, col) slices into the full
    input raster — when the bias factor rasters share that grid this
    windows them by slice directly, skipping per-chunk lat/lon
    matching (reference: bias_transforms.py lr_padded_slice args)."""
    method = getattr(transforms_mod, bc_method, None)
    if method is None or not callable(method):
        raise KeyError(
            f'Unknown bias correction method "{bc_method}"')
    kwargs = dict(bc_kwargs.get(source_feature, {}))
    idf = feature_names.index(source_feature)
    feature_data = data[..., idf]

    sig_params = inspect.signature(method).parameters
    if 'lr_padded_slice' in sig_params and lr_padded_slice is not None:
        kwargs.setdefault('lr_padded_slice', lr_padded_slice)
    if 'date_range_kwargs' in sig_params and (
            'date_range_kwargs' not in kwargs):
        kwargs['date_range_kwargs'] = get_date_range_kwargs(time_index)
    if 'lat_lon' in sig_params:
        kwargs.setdefault('lat_lon', lat_lon)
    if 'feature_name' in sig_params:
        kwargs.setdefault('feature_name', source_feature)
    if 'time_index' in sig_params:
        kwargs.setdefault('time_index', time_index)
    kwargs = {k: v for k, v in kwargs.items() if k in sig_params}
    corrected = method(feature_data, **kwargs)
    data[..., idf] = corrected
    return data


def bias_correct_features(features, data, feature_names, lat_lon,
                          time_index, bc_method, bc_kwargs,
                          lr_padded_slice=None):
    """Bias correct all requested features in place."""
    data = np.array(data)
    for feature in features:
        if feature not in feature_names:
            logger.warning(
                'Bias correction requested for "%s" but it is not in '
                'the chunk features %s', feature, feature_names)
            continue
        data = bias_correct_feature(
            feature, data, feature_names, lat_lon, time_index,
            bc_method, bc_kwargs, lr_padded_slice=lr_padded_slice)
    return data
