"""TrainingSession, profiling context, rasterizer extent guards, and
stats caching (misc aux-subsystem coverage; reference:
sup3r/models/utilities.py:30-133, rasterizers/extended.py guards)."""

import json
import os
import threading

import numpy as np
import pytest

from sup3r_tpu.models import Sup3rGan
from sup3r_tpu.models.utilities import TrainingSession, profile_to_dir
from sup3r_tpu.preprocessing.batch_handlers import BatchHandler
from sup3r_tpu.preprocessing.rasterizers import (
    Rasterizer,
    get_closest_row_col,
)
from sup3r_tpu.utilities.test_helpers import (
    make_fake_dset,
    make_fake_h5_file,
)

FEATURES = ['u_100m', 'v_100m']


def _tiny_model():
    gen = [{'class': 'Conv2D', 'filters': 8, 'kernel_size': 3,
            'strides': 1, 'padding': 'same'},
           {'class': 'SpatialExpansion', 'spatial_mult': 2},
           {'class': 'Conv2D', 'filters': 2, 'kernel_size': 3,
            'strides': 1, 'padding': 'same'}]
    disc = [{'class': 'Conv2D', 'filters': 4, 'kernel_size': 3,
             'strides': 2, 'padding': 'same'},
            {'class': 'Flatten'}, {'class': 'Dense', 'units': 1}]
    return Sup3rGan(gen, disc, learning_rate=1e-3)


def test_training_session_runs_to_completion(tmp_path):
    handler = BatchHandler([make_fake_dset((16, 16, 24), FEATURES)],
                           batch_size=2, n_batches=1, s_enhance=2,
                           t_enhance=1, sample_shape=(8, 8, 1))
    model = _tiny_model()
    session = TrainingSession(
        handler, model,
        input_resolution={'spatial': '30km', 'temporal': '60min'},
        n_epoch=1, out_dir=str(tmp_path / 'm_{epoch}'))
    out = session.run()
    assert out is model
    assert model.history is not None and len(model.history) == 1
    handler.stop()


def test_training_session_propagates_errors():
    handler = BatchHandler([make_fake_dset((16, 16, 24), FEATURES)],
                           batch_size=2, n_batches=1, s_enhance=2,
                           t_enhance=1, sample_shape=(8, 8, 1))
    model = _tiny_model()
    # an invalid kwarg raises inside the training thread and must
    # propagate to the caller
    session = TrainingSession(handler, model,
                              not_a_real_kwarg=True)
    with pytest.raises(TypeError):
        session.run()
    handler.stop()


def test_profile_to_dir_writes_trace(tmp_path):
    import jax.numpy as jnp

    log_dir = str(tmp_path / 'trace')
    with profile_to_dir(log_dir):
        _ = jnp.sum(jnp.ones((64, 64))).block_until_ready()
    found = []
    for root, _, files in os.walk(log_dir):
        found.extend(files)
    assert found, 'profiler trace directory is empty'
    # disabled: no-op, no directory requirement
    with profile_to_dir(str(tmp_path / 'none'), enabled=False):
        pass


def test_rasterizer_target_threshold(tmp_path):
    fp = make_fake_h5_file(str(tmp_path / 'wtk.h5'), (8, 8, 4),
                           ['windspeed_100m'])
    # far target with a threshold -> loud failure
    with pytest.raises(RuntimeError, match='exceeding threshold'):
        Rasterizer(fp, target=(10.0, 30.0), shape=(4, 4),
                   threshold=0.5)
    # close target works
    r = Rasterizer(fp, target=(39.2, -105.3), shape=(4, 4),
                   threshold=1.0)
    assert r.grid_shape == (4, 4)


def test_get_closest_row_col():
    lat = np.linspace(40, 39, 5)
    lon = np.linspace(-105, -104, 5)
    ll = np.dstack(np.meshgrid(lat, lon, indexing='ij'))
    row, col = get_closest_row_col(ll, (39.5, -104.5))
    assert (row, col) == (2, 2)


def test_stats_cache_roundtrip(tmp_path):
    """StatsCollection writes/reloads means+stds JSON caches."""
    from sup3r_tpu.preprocessing.stats import StatsCollection

    data = [make_fake_dset((10, 10, 20), FEATURES)]
    means_fp = str(tmp_path / 'means.json')
    stds_fp = str(tmp_path / 'stds.json')
    s1 = StatsCollection(data, means=means_fp, stds=stds_fp)
    assert os.path.exists(means_fp)
    cached = json.load(open(means_fp))
    assert set(cached) == set(FEATURES)
    # second collection with a DIFFERENT dataset reuses the cache
    other = [make_fake_dset((10, 10, 20), FEATURES)]
    s2 = StatsCollection(other, means=means_fp, stds=stds_fp)
    assert s2.means == s1.means
    assert s2.stds == s1.stds


def test_safe_serialize_numpy_and_slices():
    """safe_serialize handles numpy scalars/arrays and slices the way
    model_params/meta writing requires (reference:
    sup3r/utilities/utilities.py safe_serialize)."""
    import json

    import numpy as np

    from sup3r_tpu.utilities import safe_serialize

    payload = {
        'i': np.int64(3), 'f': np.float32(1.5),
        'arr': np.arange(3, dtype=np.float64),
        'sl': slice(2, 10, 2), 'nested': {'b': np.bool_(True)},
    }
    out = json.loads(safe_serialize(payload))
    assert out['i'] == 3 and abs(out['f'] - 1.5) < 1e-6
    assert out['arr'] == [0.0, 1.0, 2.0]
    assert out['nested']['b'] is True  # np.bool_ -> real bool
    assert json.loads(safe_serialize(
        {'flag': np.bool_(False)}))['flag'] is False


def test_get_dset_attrs_known_and_unknown():
    """Known output features resolve their OUTPUT_ATTRS (scale factor,
    dtype); unknown features warn and fall back to float32
    (reference: sup3r/utilities/utilities.py get_dset_attrs +
    OUTPUT_ATTRS table)."""
    import warnings

    from sup3r_tpu.utilities import get_dset_attrs

    attrs, dtype = get_dset_attrs('windspeed_100m')
    assert 'scale_factor' in attrs
    assert dtype == attrs.get('dtype', 'float32')
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter('always')
        attrs, dtype = get_dset_attrs('totally_novel_feature')
    assert attrs == {} and dtype == 'float32'
    assert any('OUTPUT_ATTRS' in str(x.message) for x in w)


def test_timer_accumulates():
    from sup3r_tpu.utilities import Timer

    timer = Timer()
    def work(n):
        return sum(range(n))
    assert timer(work)(100) == sum(range(100))
    assert 'work' in timer.log
    assert timer.log['work'] >= 0
